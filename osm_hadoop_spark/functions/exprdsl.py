"""Tiny dual-render expression DSL: one formula, two engines.

Several kernels in this repo run the SAME closed-form integer ladder in
Spark (as Column expressions) and in DuckDB (as the oracle SQL) — the
Bresenham closed form, the orientation ladder, the Liang-Barsky clip.
Those were transcribed twice by hand.  For the polygon-coverage kernel
(functions/coverage.py) the ladder is large enough that double
transcription is a real error source, so the formula is written ONCE
against this DSL and rendered to either engine.

Only what integer closed forms need: +, -, *, integer comparisons,
least/greatest, and if-then-else.  No division — the kernels this
serves are single-denominator by construction.

Rendering contract: `to_spark(cols)` maps variable names through the
dict `cols` (name -> pyspark Column); `to_sql(names)` maps through
`names` (name -> SQL snippet).  Comparisons produce boolean Exprs
usable only inside `iff`.
"""

from __future__ import annotations


class Expr:
    # -- construction ------------------------------------------------------
    @staticmethod
    def lift(v):
        return v if isinstance(v, Expr) else Lit(v)

    def __add__(self, o):
        return Bin("+", self, Expr.lift(o))

    def __radd__(self, o):
        return Bin("+", Expr.lift(o), self)

    def __sub__(self, o):
        return Bin("-", self, Expr.lift(o))

    def __rsub__(self, o):
        return Bin("-", Expr.lift(o), self)

    def __mul__(self, o):
        return Bin("*", self, Expr.lift(o))

    def __rmul__(self, o):
        return Bin("*", Expr.lift(o), self)

    def __neg__(self):
        return Bin("-", Lit(0), self)

    def __gt__(self, o):
        return Bin(">", self, Expr.lift(o))

    def __ge__(self, o):
        return Bin(">=", self, Expr.lift(o))

    def __lt__(self, o):
        return Bin("<", self, Expr.lift(o))

    def __le__(self, o):
        return Bin("<=", self, Expr.lift(o))

    def eq(self, o):
        return Bin("==", self, Expr.lift(o))

    def ne(self, o):
        return Bin("!=", self, Expr.lift(o))

    # -- rendering ---------------------------------------------------------
    def to_spark(self, cols):
        raise NotImplementedError

    def to_sql(self, names):
        raise NotImplementedError


class Lit(Expr):
    def __init__(self, v):
        self.v = int(v)

    def to_spark(self, cols):
        from pyspark.sql import functions as F

        return F.lit(self.v).cast("long")

    def to_sql(self, names):
        return f"CAST({self.v} AS BIGINT)"


class Var(Expr):
    def __init__(self, name):
        self.name = name

    def to_spark(self, cols):
        return cols[self.name]

    def to_sql(self, names):
        return names[self.name]


_SQL_OP = {"+": "+", "-": "-", "*": "*", ">": ">", ">=": ">=",
           "<": "<", "<=": "<=", "==": "=", "!=": "<>"}


class Bin(Expr):
    def __init__(self, op, a, b):
        self.op, self.a, self.b = op, a, b

    def to_spark(self, cols):
        a, b = self.a.to_spark(cols), self.b.to_spark(cols)
        return {
            "+": lambda: a + b, "-": lambda: a - b, "*": lambda: a * b,
            ">": lambda: a > b, ">=": lambda: a >= b,
            "<": lambda: a < b, "<=": lambda: a <= b,
            "==": lambda: a == b, "!=": lambda: a != b,
        }[self.op]()

    def to_sql(self, names):
        return f"({self.a.to_sql(names)} {_SQL_OP[self.op]} {self.b.to_sql(names)})"


class Iff(Expr):
    def __init__(self, cond, t, f):
        self.cond, self.t, self.f = cond, Expr.lift(t), Expr.lift(f)

    def to_spark(self, cols):
        from pyspark.sql import functions as F

        return F.when(self.cond.to_spark(cols), self.t.to_spark(cols)).otherwise(
            self.f.to_spark(cols)
        )

    def to_sql(self, names):
        return (
            f"(CASE WHEN {self.cond.to_sql(names)} THEN {self.t.to_sql(names)} "
            f"ELSE {self.f.to_sql(names)} END)"
        )


def iff(cond, t, f):
    return Iff(cond, t, f)


class NAry(Expr):
    """least/greatest rendered to the engines' native variadics.

    Rendering to nested ``iff`` would duplicate every operand subtree
    (once in the comparison, once in the branch) — exponential growth
    under chaining.  Both engines' native LEAST/GREATEST take the
    operands once.  NULL never occurs in these kernels, so the engines'
    differing NULL semantics are out of scope.
    """

    def __init__(self, fn, xs):
        self.fn, self.xs = fn, [Expr.lift(x) for x in xs]

    def to_spark(self, cols):
        from pyspark.sql import functions as F

        args = [x.to_spark(cols) for x in self.xs]
        return F.least(*args) if self.fn == "least" else F.greatest(*args)

    def to_sql(self, names):
        return f"{self.fn}({', '.join(x.to_sql(names) for x in self.xs)})"


def least(*xs):
    return NAry("least", xs)


def greatest(*xs):
    return NAry("greatest", xs)


def clamp(x, lo, hi):
    return least(greatest(x, lo), hi)


class Div(Expr):
    """EXACT-divisor integer division (b | a required by the caller).

    Rendered as plain division + long cast: both engines divide exact
    int64 values < 2^53 through doubles, and an exact quotient is
    representable, so the result is bit-identical.  Never use for
    truncating division — that is what the kernels avoid by design.
    """

    def __init__(self, a, b):
        self.a, self.b = Expr.lift(a), Expr.lift(b)

    def to_spark(self, cols):
        return (self.a.to_spark(cols) / self.b.to_spark(cols)).cast("long")

    def to_sql(self, names):
        return f"CAST(({self.a.to_sql(names)} / {self.b.to_sql(names)}) AS BIGINT)"


def exact_div(a, b):
    return Div(a, b)


class Mod(Expr):
    """Signed remainder (sign of the dividend) — Spark's `%` (Java `%`)
    and DuckDB's `%` agree bit-for-bit on BIGINT, which is what makes
    `floor_div` below engine-exact."""

    def __init__(self, a, b):
        self.a, self.b = Expr.lift(a), Expr.lift(b)

    def to_spark(self, cols):
        return self.a.to_spark(cols) % self.b.to_spark(cols)

    def to_sql(self, names):
        return f"({self.a.to_sql(names)} % {self.b.to_sql(names)})"


def floor_div(a, b):
    """Floored integer division for b > 0, built from signed remainder +
    exact division: a - ((a % b) + b) % b is divisible by b, so the final
    Div is exact and the whole thing is bit-identical across engines
    (inputs must stay < 2^53 in magnitude)."""
    a, b = Expr.lift(a), Expr.lift(b)
    return Div(a - Mod(Mod(a, b) + b, b), b)


# ---------------------------------------------------------------------------
# staged rendering: one named column per binding, so later bindings refer
# to earlier ones BY NAME — no subtree duplication in either engine.
# ---------------------------------------------------------------------------


class _SparkCols(dict):
    def __missing__(self, k):
        from pyspark.sql import functions as F

        return F.col(k)


class _SqlNames(dict):
    def __missing__(self, k):
        return k


def bind_spark(df, bindings):
    """Apply [(name, Expr)] as chained withColumn; Vars resolve to columns."""
    cols = _SparkCols()
    for name, e in bindings:
        df = df.withColumn(name, e.to_spark(cols))
    return df


def refs(e) -> set:
    """Names of all Vars in an Expr tree."""
    if isinstance(e, Var):
        return {e.name}
    out = set()
    for child in ("a", "b", "t", "f", "cond"):
        if hasattr(e, child):
            out |= refs(getattr(e, child))
    if isinstance(e, NAry):
        for x in e.xs:
            out |= refs(x)
    return out


def sql_layers(base_sql: str, bindings) -> str:
    """Wrap base_sql in nested SELECTs, adding each binding as a named
    column.  Bindings that don't reference a name defined in the current
    layer share that layer (SQL aliases aren't visible within their own
    SELECT), so the nesting depth is the dependency depth, not the
    binding count."""
    layers, defined = [], set()
    for name, e in bindings:
        if layers and not (refs(e) & defined):
            layers[-1].append((name, e))
            defined.add(name)
        else:
            layers.append([(name, e)])
            defined = {name}
    q = f"({base_sql})"
    names = _SqlNames()
    for layer in layers:
        cols = ", ".join(f"{e.to_sql(names)} AS {n}" for n, e in layer)
        q = f"(SELECT *, {cols} FROM {q})"
    return q
