"""JVM (Catalyst Column) twins of the WKT formatters in geometry.py.

The reference serializes assembled LineStrings as WKT into the way tag map
(WayBuilder.scala:97-101 via JTS WKTWriter); geometry.py replicates that
format in Python (integral ordinate -> no fraction, otherwise shortest
round-trip repr). This module reproduces the SAME strings inside
whole-stage codegen so WKT emission needs no Python workers.

How parity is achieved (pinned by tests/test_way_assembly.py jvm-parity
tests over random full-precision doubles in every formatting band):

JDK note (round-5 ADVICE fix): byte parity rests on Java Double.toString
emitting the same digit string as Python repr. JDK >= 19 guarantees
shortest round-trip digits (JDK-4511638, Ryu); on older JDKs (this host:
17) the legacy FloatingDecimal occasionally emits NON-shortest digits for
|v| > 2^53 (e.g. 2^60 -> '1.15292150460684698E18' vs repr
'1.152921504606847e+18'), so the parity claim on JDK < 19 is scoped to
|v| <= 2^53 — far beyond any lon/lat ordinate — and pinned empirically by
the band test on the running JVM. Use impl='arrow' (way_assembly.with_wkt)
if full-range parity on an old JDK is ever required.

- integral and |v| < 1e15: cast to bigint then string — identical to
  Python ``str(int(v))``.
- non-integral, Java plain-decimal band (1e-3 <= |v| < 1e7): Java
  ``Double.toString`` and Python ``repr`` both emit the shortest decimal
  that uniquely identifies the double, and in this band their layouts
  coincide — verified empirically over 20k+ uniform doubles (zero
  mismatches; see test).
- outside that band Java switches to E-notation where Python's layout
  differs (Python stays plain down to 1e-4 and up to 1e16). We reassemble
  Python's layout from Java's mantissa/exponent with string ops:
    * exponent >= 16:  Python positive e-notation "d[.ddd]e+kk" (every
      double >= 1e16 is integral; round 5, ADVICE fix);
    * exponent >= len(digits)-1 (integral, 1e15 <= |v| < 1e16 — excluded
      from the integral fast path): digits zero-padded to exponent+1
      places, then ".0" (round 5, ADVICE fix);
    * exponent >= 0:   digits re-split around the decimal point;
    * exponent == -4:  "0.000" + digits (Python plain band);
    * exponent <= -5:  Python e-notation "d[.ddd]e-0k" (mantissa drops a
      trailing ".0", exponent lower-cased and zero-padded to 2 digits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_fmt_ord(v: Column) -> Column:
    """One ordinate -> the exact string geometry.py _fmt_ord produces.

    Cost note: this expression runs inside the zip_with lambda of the ring
    body, i.e. interpreted per ordinate (HOFs are CodegenFallback). The
    Java Double.toString is therefore bound ONCE via transform over a
    single-element array (a NamedLambdaVariable, O(1) to re-read) instead
    of being recomputed by every reference; the rare-band reassembly tree
    only evaluates when the string actually carries an exponent."""
    # try_cast: |v| >= 2^63 overflows the ANSI bigint cast (would throw);
    # NULL makes is_int NULL -> falsy -> the string path handles it
    i = v.try_cast("bigint")
    is_int = (v == i.cast("double")) & (F.abs(v) < F.lit(1e15))

    def from_s(s: Column) -> Column:
        has_e = F.contains(s, F.lit("E"))
        mant = F.split_part(s, F.lit("E"), F.lit(1))
        expn = F.split_part(s, F.lit("E"), F.lit(2)).cast("int")
        neg = F.startswith(mant, F.lit("-"))
        mant_abs = F.when(neg, F.substring(mant, 2, 1024)).otherwise(mant)
        # Java mantissa always has one digit before the point; digit string
        # = mantissa minus the point, with Java's filler ".0" dropped first
        digits = F.when(
            F.endswith(mant_abs, F.lit(".0")),
            F.substring(mant_abs, 1, F.length(mant_abs) - 2),
        ).otherwise(F.replace(mant_abs, F.lit("."), F.lit("")))
        sign = F.when(neg, F.lit("-")).otherwise(F.lit(""))

        # exponent >= 0, non-integral: fractional digits exist past expn
        plain_pos = F.concat(
            digits.substr(F.lit(1), expn + F.lit(1)),
            F.lit("."),
            digits.substr(expn + F.lit(2), F.lit(1024)),
        )
        # integral with 1e15 <= |v| < 1e16 (excluded from the is_int fast
        # path, and Java writes E-notation from 1e7): Python repr stays
        # plain-decimal below 1e16 — zero-pad the digits and append '.0'
        int_plain = F.concat(
            F.rpad(digits, expn + F.lit(1), "0"), F.lit(".0")
        )
        # exponent == -4: Python's last plain-decimal band
        plain_neg4 = F.concat(F.lit("0.000"), digits)
        # e-notation (Python style): mantissa drops a lone trailing '.0',
        # exponent is lower-case, signed, zero-padded to >= 2 digits
        mant_py = F.when(
            F.length(digits) == 1, digits
        ).otherwise(
            F.concat(
                F.substring(digits, 1, 1), F.lit("."),
                F.substring(digits, 2, 1024),
            )
        )
        expd = F.abs(expn).cast("string")
        expd2 = F.when(
            F.length(expd) == 1, F.concat(F.lit("0"), expd)
        ).otherwise(expd)
        e_neg = F.concat(mant_py, F.lit("e-"), expd2)
        # |v| >= 1e16 (every such double is integral): Python repr uses
        # positive e-notation — '1e+16', '1.2345678901234568e+17'
        e_pos = F.concat(mant_py, F.lit("e+"), expd2)

        from_e = F.concat(
            sign,
            F.when(expn >= 16, e_pos)
            .when(expn >= F.length(digits) - 1, int_plain)
            .when(expn >= 0, plain_pos)
            .when(expn == -4, plain_neg4)
            .otherwise(e_neg),
        )
        return F.when(~has_e, s).otherwise(from_e)

    bound = F.transform(F.array(v.cast("string")), from_s)
    return F.when(is_int, i.cast("string")).otherwise(F.element_at(bound, 1))


def _sql_ring_body(xs: Column, ys: Column) -> Column:
    """Ring coordinate body 'x y, x y, ...' with a whole-row fast path.

    Fast path (round 5): cast(arrays_zip(xs, ys) AS string) renders every
    ordinate with the SAME Java Double.toString the per-element formatter
    uses, in one codegen cast — '[{1.5, 10.0}, {2.0, -3.75}]' — and a
    fixed sequence of whole-string ops reshapes it into the WKT body,
    stripping the '.0' Java appends to integral ordinates (= str(int(v))).
    It applies only when no ordinate needs band reassembly: any 'E'
    (Java E-notation, |v| >= 1e7 or < 1e-3) or a '-0.0' (Python prints
    '0') falls back to the per-element sql_fmt_ord path, so the output is
    byte-identical either way (pinned by the jvm==arrow WKT tests)."""
    zs = F.arrays_zip(xs, ys).cast("string")
    fast_ok = ~(F.contains(zs, F.lit("E")) | F.contains(zs, F.lit("-0.0")))
    body = F.substring(zs, F.lit(3), F.length(zs) - 4)
    body = F.replace(body, F.lit("}, {"), F.lit("; "))
    body = F.replace(body, F.lit(", "), F.lit(" "))
    body = F.replace(body, F.lit("; "), F.lit(", "))
    body = F.regexp_replace(body, r"\.0(?=[ ,])|\.0$", "")
    slow = F.array_join(
        F.zip_with(
            xs, ys,
            lambda x, y: F.concat(sql_fmt_ord(x), F.lit(" "), sql_fmt_ord(y)),
        ),
        ", ",
    )
    return F.when(fast_ok, body).otherwise(slow)


def sql_linestring_wkt(xs: Column, ys: Column) -> Column:
    """(xs, ys) arrays -> 'LINESTRING (x y, ...)' — codegen twin of
    geometry.format_linestring_wkt (JTS WKTWriter layout)."""
    return F.concat(F.lit("LINESTRING ("), _sql_ring_body(xs, ys), F.lit(")"))


def sql_multilinestring_wkt(xs_list: Column, ys_list: Column) -> Column:
    """array<array<double>> member coords -> 'MULTILINESTRING ((...), ...)'
    — codegen twin of geometry.format_multilinestring_wkt."""
    bodies = F.zip_with(
        xs_list,
        ys_list,
        lambda xs, ys: F.concat(F.lit("("), _sql_ring_body(xs, ys), F.lit(")")),
    )
    return F.concat(
        F.lit("MULTILINESTRING ("), F.array_join(bodies, ", "), F.lit(")")
    )
