"""Exact balanced range partitioning — global ranks without a global sort.

Spark's own RangePartitioner (exchange planning for sortWithinPartitions
/ write-ordered layouts) SAMPLES boundaries, so real bucket sizes skew
with the data. This computes EXACT boundaries: every row gets its true
0-based global rank in key order, bucket = rank * B div N, so bucket
sizes differ by at most one — the layout planner you want before a
range-clustered write (the companion of the Hilbert layout keys, which
cluster by locality; this clusters by key order with provable balance).

The naive global rank is `row_number() OVER (ORDER BY k)` — a
single-partition window, the canonical anti-scale plan. The scalable
form is a two-level distributed prefix sum:

  1. per-key counts (one hash aggregate — dup keys collapse here);
  2. coarse-bucket subtotals (keys grouped by k div coarse_div), prefix-
     summed with ONE window over the #coarse-buckets-row relation — the
     only ordered window, over a relation whose size the caller bounds
     with `coarse_div`, independent of row count;
  3. within each coarse bucket, a PARTITIONED cumulative sum assigns
     each distinct key its start rank (parallel across coarse buckets);
  4. per-row rank = key start + (row_number within key) − 1, both
     windows partitioned, never global.

Rows sharing a key may straddle a bucket boundary; intra-key order is
arbitrary but the per-bucket AGGREGATES (count, lo, hi) are order-free:
the rank multiset of a key's rows is fixed, so which duplicate lands
where cannot change any output value. The DuckDB twin uses the naive
global row_number — opposite mechanism, identical buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def balanced_range_buckets(
    rows: DataFrame, buckets: int, key: str = "k", coarse_div: int = 1 << 8
) -> DataFrame:
    """Per-bucket stats of the exact B-way balanced range partitioning.

    rows: any DataFrame with an integer `key` column (duplicates fine).
    Returns (bucket, n_rows, lo, hi): 0-based bucket id, its exact row
    count (max spread 1 across buckets), and its key range.
    """
    cnt = rows.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cnt = cnt.withColumn("coarse", F.expr(f"k DIV {coarse_div}"))

    sub = cnt.groupBy("coarse").agg(F.sum("c").alias("sc"))
    w_coarse = Window.orderBy("coarse").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sub = sub.select(
        "coarse", F.coalesce(F.sum("sc").over(w_coarse), F.lit(0)).alias("off")
    )

    w_in = (
        Window.partitionBy("coarse")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    starts = (
        cnt.join(sub, "coarse")
        .select(
            "k",
            "c",
            (F.col("off") + F.coalesce(F.sum("c").over(w_in), F.lit(0))).alias(
                "start"
            ),
        )
    )

    total = cnt.groupBy().agg(F.sum("c").alias("n"))
    starts = starts.crossJoin(F.broadcast(total)).select(
        "k", "start", "n"
    )

    w_key = Window.partitionBy("k").orderBy(F.monotonically_increasing_id())
    ranked = (
        rows.select(F.col(key).alias("k"))
        .withColumn("_rn", F.row_number().over(w_key))
        .join(starts, "k")
        .select(
            "k",
            F.expr(f"((start + _rn - 1) * {buckets}) DIV n").alias("bucket"),
        )
    )
    return ranked.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("k").alias("lo"),
        F.max("k").alias("hi"),
    )
