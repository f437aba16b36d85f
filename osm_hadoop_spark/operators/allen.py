"""Allen's interval-algebra census — exact pair counts for all 13
relations without enumerating disjoint pairs.

Allen (1983) partitions ordered pairs of proper intervals into 13
mutually-exclusive relations (equals, starts/started-by,
finishes/finished-by, meets/met-by, overlaps/overlapped-by,
during/contains, before/after).  The census is the temporal-quality
profile of two event sets (how do maintenance windows relate to
outages? sessions to promos?) and the validation layer over the
engine's interval operators (interval_join counts OVERLAP only;
islands MERGES; scheduling SELECTS).

The scale problem is that BEFORE/AFTER pairs are the overwhelming
majority — na*nb per key — and any plan that materializes them dies.
This census never does:

  - the 11 contact relations come from ONE bucketized filter-and-refine
    join (interval_join.py) run on [s, e+1) — widening each end by one
    tick turns half-open overlap into the touching-INCLUSIVE predicate
    a.s <= b.e AND b.s <= a.e, so meets/met-by pairs surface — then an
    exact CASE classifies each candidate into exactly one relation
    (mutual exclusivity over proper intervals is Allen's theorem;
    pinned exhaustively in tests);
  - BEFORE (a.e < b.s) is counted by a union-sentinel running sum (the
    resample/scheduling trick): a-end markers and b-start queries share
    one (key, pos) sort, queries ordered FIRST among ties so equality
    is strict; AFTER symmetrically.  Two windows, zero pair
    materialization.

Zero/negative-length rows are dropped (Allen is defined on proper
intervals; same contract as operators/scheduling.py).  Returns
(relation, n_pairs) with all 13 relations zero-filled.

100 TB posture: the contact join inherits interval_join's bucket
guard; the windows sort slim 3-column unions keyed by the entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RELATIONS = (
    "equals", "starts", "started_by", "finishes", "finished_by",
    "meets", "met_by", "overlaps", "overlapped_by", "during", "contains",
    "before", "after",
)


def _classify(sa, ea, sb, eb):
    return (
        F.when((sa == sb) & (ea == eb), "equals")
        .when((sa == sb) & (ea < eb), "starts")
        .when((sa == sb) & (ea > eb), "started_by")
        .when((ea == eb) & (sa > sb), "finishes")
        .when((ea == eb) & (sa < sb), "finished_by")
        .when(ea == sb, "meets")
        .when(eb == sa, "met_by")
        .when((sa < sb) & (ea > sb) & (ea < eb), "overlaps")
        .when((sb < sa) & (eb > sa) & (eb < ea), "overlapped_by")
        .when((sa > sb) & (ea < eb), "during")
        .when((sa < sb) & (ea > eb), "contains")
    )


def _strict_count(left_pts, right_q, key: str):
    """Sum over query rows of #{marker pos strictly < query pos} within
    key: markers (key, pos, w=1, typ=1), queries (key, pos, w=0,
    typ=0); ties put the query first, making the count strict."""
    u = left_pts.unionByName(right_q)
    w = (
        Window.partitionBy("key")
        .orderBy("pos", "typ")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    per_q = (
        u.withColumn("c", F.sum("w").over(w))
        .filter(F.col("typ") == 0)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"))
    )
    return per_q


def allen_census(
    a: DataFrame,
    b: DataFrame,
    key: str = "key",
    s: str = "s",
    e: str = "e",
    bucket_width: int = 3_600_000_000,
) -> DataFrame:
    """a(key, s, e) x b(key, s, e), proper intervals -> 13-row
    (relation, n_pairs) census over same-key ordered pairs."""
    from osm_hadoop_spark.operators.interval_join import interval_overlap_join

    def prep(df, sn, en):
        return df.select(
            F.col(key).alias("key"),
            F.col(s).cast("bigint").alias(sn),
            F.col(e).cast("bigint").alias(en),
        ).filter(F.col(sn) < F.col(en))

    av = prep(a, "sa", "ea")
    bv = prep(b, "sb", "eb")

    cand = interval_overlap_join(
        av.select("key", "sa", "ea",
                  F.col("sa").alias("ja_s"), (F.col("ea") + 1).alias("ja_e")),
        bv.select("key", "sb", "eb",
                  F.col("sb").alias("jb_s"), (F.col("eb") + 1).alias("jb_e")),
        on="key",
        a_start="ja_s", a_end="ja_e", b_start="jb_s", b_end="jb_e",
        bucket_width=bucket_width,
    )
    contact = (
        cand.select(
            _classify(
                F.col("sa"), F.col("ea"), F.col("sb"), F.col("eb")
            ).alias("relation")
        )
        .groupBy("relation")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )

    def mark(df, col, typ, w):
        return df.select(
            "key", F.col(col).alias("pos"),
            F.lit(typ).alias("typ"), F.lit(w).cast("bigint").alias("w"),
        )

    before = _strict_count(
        mark(av, "ea", 1, 1), mark(bv, "sb", 0, 0), key
    ).select(F.lit("before").alias("relation"), F.col("n").alias("n_pairs"))
    after = _strict_count(
        mark(bv, "eb", 1, 1), mark(av, "sa", 0, 0), key
    ).select(F.lit("after").alias("relation"), F.col("n").alias("n_pairs"))

    frame = a.sparkSession.createDataFrame(
        [(r,) for r in RELATIONS], "relation string"
    )
    got = contact.unionByName(before).unionByName(after)
    return frame.join(got, "relation", "left").select(
        "relation",
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
    )
