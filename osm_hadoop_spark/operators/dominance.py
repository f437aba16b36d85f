"""Exact 2-D dominance counts — per point, how many points it
dominates (x' <= x AND y' <= y), the quantitative sibling of the
skyline family.

pareto_skyline answers WHO is non-dominated; skyline_layers ranks into
tiers; this counts — dom(p) is the "k-dominance" score behind top-k
dominating queries (Yiu & Mamoulis VLDB'07) and doubles as the exact
joint-CDF evaluated at every point.  The sequential answer is a
Fenwick sweep (sort by x, BIT over y) — per-row sequential state with
no relational form; the distributed-exact decomposition used here
splits by y-bands:

  band(p) = y DIV band_width.  Then
    dom(p) = Σ_{b < band(p)}  #{q in band b : x_q <= x_p}     (term 1)
           + #{q in band(p) : x_q <= x_p AND y_q <= y_p} - 1  (term 2)

  term 1 is a rank lookup per (point, lower band) — ONE union-sentinel
  running sum per band partition (members at their x with weight 1,
  queries exploded to each lower band; ties put members first so <= is
  inclusive — the scheduling/allen window trick);
  term 2 is a same-band pair join.

Cost model (the operator's documented lever): with B occupied bands
and band population n_b, term 1 is O(n*B) exploded rows and term 2 is
O(Σ n_b²).  band_width trades them: width ~ y-range/sqrt(n) gives the
O(n^1.5) classic; a Fenwick-style log-decomposition would reach
O(n log n) but its top dyadic blocks put half the data in one window
partition — the skew trap this banding deliberately avoids (every
window partition here is one band's membership plus its queries).
Self-pairs are excluded by the -1; duplicates count each other
symmetrically.  All exact int64; brute-oracle pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dominance_counts(
    points: DataFrame,
    band_width: int,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """points(id, x, y) int64 -> (id, x, y, dom) with dom = #{q != p :
    x_q <= x_p AND y_q <= y_p}."""
    if band_width < 1:
        raise ValueError("band_width must be >= 1")
    p = points.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(x).cast("bigint").alias("x"),
        F.col(y).cast("bigint").alias("y"),
        F.floor(F.col(y) / band_width).cast("bigint").alias("band"),
    )

    # term 1: queries exploded to every occupied band strictly below
    bands = p.select(F.col("band").alias("mband")).distinct()
    lower = p.alias("q").join(
        F.broadcast(bands), F.col("mband") < F.col("band")
    ).select("id", F.col("x").alias("pos"), F.col("mband").alias("wband"))
    members = p.select(
        F.col("band").alias("wband"), F.col("x").alias("pos"),
        F.lit(0).alias("typ"), F.lit(1).cast("bigint").alias("w"),
        F.lit(None).cast("bigint").alias("qid"),
    )
    queries = lower.select(
        "wband", "pos", F.lit(1).alias("typ"),
        F.lit(0).cast("bigint").alias("w"), F.col("id").alias("qid"),
    )
    w_run = (
        Window.partitionBy("wband")
        .orderBy("pos", "typ")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t1 = (
        members.unionByName(queries)
        .withColumn("c", F.sum("w").over(w_run))
        .filter(F.col("qid").isNotNull())
        .groupBy(F.col("qid").alias("id"))
        .agg(F.sum("c").cast("long").alias("t1"))
    )

    # term 2: same-band pair census (includes the self pair, hence -1)
    a, b = p.alias("a"), p.alias("b")
    t2 = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("b.x") <= F.col("a.x"))
            & (F.col("b.y") <= F.col("a.y")),
        )
        .groupBy(F.col("a.id").alias("id"))
        .agg((F.count(F.lit(1)) - 1).cast("long").alias("t2"))
    )

    z = F.lit(0).cast("long")
    return (
        p.join(t1, "id", "left")
        .join(t2, "id", "left")
        .select(
            "id", "x", "y",
            (F.coalesce("t1", z) + F.coalesce("t2", z)).cast("long")
            .alias("dom"),
        )
    )
