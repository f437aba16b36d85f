"""JVM (Catalyst Column) twins of the WKT formatters in geometry.py.

The reference serializes assembled LineStrings as WKT into the way tag map
(WayBuilder.scala:97-101 via JTS WKTWriter); geometry.py replicates that
format in Python (integral ordinate -> no fraction, otherwise shortest
round-trip repr). This module reproduces the SAME strings inside
whole-stage codegen so WKT emission needs no Python workers.

How parity is achieved (pinned by tests/test_way_assembly.py jvm-parity
tests over random full-precision doubles in every formatting band):

- integral and |v| < 1e15: cast to bigint then string — identical to
  Python ``str(int(v))``.
- non-integral, Java plain-decimal band (1e-3 <= |v| < 1e7): Java
  ``Double.toString`` and Python ``repr`` both emit the shortest decimal
  that uniquely identifies the double, and in this band their layouts
  coincide — verified empirically over 20k+ uniform doubles (zero
  mismatches; see test).
- non-integral outside that band Java switches to E-notation where Python
  does not (Python stays plain down to 1e-4 and up to 1e16; any
  non-integral double is < 2^52, so the positive band never needs
  E-output). We reassemble Python's layout from Java's mantissa/exponent
  with string ops, still codegen:
    * exponent >= 0:   digits re-split around the decimal point;
    * exponent == -4:  "0.000" + digits (Python plain band);
    * exponent <= -5:  Python e-notation "d[.ddd]e-0k" (mantissa drops a
      trailing ".0", exponent lower-cased and zero-padded to 2 digits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_fmt_ord(v: Column) -> Column:
    """One ordinate -> the exact string geometry.py _fmt_ord produces."""
    i = v.cast("bigint")
    is_int = (v == i.cast("double")) & (F.abs(v) < F.lit(1e15))
    s = v.cast("string")
    has_e = F.contains(s, F.lit("E"))

    mant = F.split_part(s, F.lit("E"), F.lit(1))
    expn = F.split_part(s, F.lit("E"), F.lit(2)).cast("int")
    neg = F.startswith(mant, F.lit("-"))
    mant_abs = F.when(neg, F.substring(mant, 2, 1024)).otherwise(mant)
    # Java mantissa always has one digit before the point; digit string =
    # mantissa minus the point, with Java's filler ".0" dropped first
    digits = F.when(
        F.endswith(mant_abs, F.lit(".0")),
        F.substring(mant_abs, 1, F.length(mant_abs) - 2),
    ).otherwise(F.replace(mant_abs, F.lit("."), F.lit("")))
    sign = F.when(neg, F.lit("-")).otherwise(F.lit(""))

    # exponent >= 0 (non-integral => fractional digits exist => no pad)
    plain_pos = F.concat(
        digits.substr(F.lit(1), expn + F.lit(1)),
        F.lit("."),
        digits.substr(expn + F.lit(2), F.lit(1024)),
    )
    # exponent == -4: Python's last plain-decimal band
    plain_neg4 = F.concat(F.lit("0.000"), digits)
    # exponent <= -5: Python e-notation
    mant_py = F.when(
        F.length(digits) == 1, digits
    ).otherwise(
        F.concat(F.substring(digits, 1, 1), F.lit("."), F.substring(digits, 2, 1024))
    )
    expd = F.abs(expn).cast("string")
    e_py = F.concat(
        mant_py,
        F.lit("e-"),
        F.when(F.length(expd) == 1, F.concat(F.lit("0"), expd)).otherwise(expd),
    )

    from_e = F.concat(
        sign,
        F.when(expn >= 0, plain_pos)
        .when(expn == -4, plain_neg4)
        .otherwise(e_py),
    )
    return (
        F.when(is_int, i.cast("string"))
        .when(~has_e, s)
        .otherwise(from_e)
    )


def _sql_ring_body(xs: Column, ys: Column) -> Column:
    pts = F.zip_with(
        xs, ys, lambda x, y: F.concat(sql_fmt_ord(x), F.lit(" "), sql_fmt_ord(y))
    )
    return F.array_join(pts, ", ")


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
