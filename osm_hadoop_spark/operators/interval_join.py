"""Interval overlap join — bucketized filter-and-refine, no range scan.

Joins two interval sets on key equality + time overlap
(`a.start < b.end AND b.start < a.end`, half-open). Spark's built-in
answer to an inequality join is BroadcastNestedLoop (only if one side is
small) or a cartesian product per key — both scale traps. The shape that
survives 100 TB is the same filter-and-refine used by the engine's tile
join (operators/tile_join.py, J3): quantize time into fixed buckets,
explode each interval to the buckets it touches, equi-join on
(key, bucket), then apply the exact overlap predicate.

  cost = sum over buckets of |A_bucket| x |B_bucket|   (local products)
  vs     sum over keys    of |A_key|    x |B_key|      (naive theta join)

The bucket width is the operator's skew/selectivity lever: ~ the median
interval length keeps the per-interval explode factor ~2 while making
each bucket's local product small. A pair overlapping several shared
buckets would surface once per bucket, so the join emits each pair
exactly once via the standard "count only in the FIRST shared bucket"
trick: bucket == max(floor(a.start/w), floor(b.start/w)) — a closed-form
dedupe that avoids a dropDuplicates shuffle over the pair set entirely.

Reference parity: the reference has no temporal operators; this is the
interval analog of its way x tile filter-and-refine
(/root/reference/src/main/scala/.../GetTilesForWays.scala cover step),
and shares its guard rails: the explode factor is bounded by
`max_buckets_per_interval` (corrupt/degenerate intervals would otherwise
amplify unboundedly — same failure mode as the J3 cell-cap guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_overlap_join"]


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    on: str,
    a_start: str = "a_start",
    a_end: str = "a_end",
    b_start: str = "b_start",
    b_end: str = "b_end",
    bucket_width: int = 3_600_000_000,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """All (a, b) row pairs with equal `on` key and overlapping intervals.

    Interval bounds are integral (e.g. unix micros; `bucket_width`
    defaults to one hour of micros). Half-open overlap semantics:
    [s1, e1) x [s2, e2) overlap iff s1 < e2 AND s2 < e1 — zero-length
    intervals match nothing. Returns a.* + b.* (caller projects).

    Intervals longer than `max_buckets_per_interval * bucket_width` are
    dropped (corrupt-input guard — same posture as the tile join's
    cell cap); pass a larger cap for genuinely year-long intervals.
    """
    overlap = set(a.columns) & set(b.columns) - {on}
    if overlap:
        raise ValueError(
            f"a and b must have disjoint columns apart from {on!r}: {sorted(overlap)}"
        )

    # distinct helper-column names per side: a and b may derive from the
    # SAME source table (self-join), where shared derived names would
    # trip Spark's ambiguous-self-join resolution
    def bucketize(df: DataFrame, start: str, end: str, side: str) -> DataFrame:
        lo = F.floor(F.col(start) / bucket_width)
        # half-open end: an interval ending exactly on a bucket edge does
        # not touch the next bucket
        hi = F.floor((F.col(end) - 1) / bucket_width)
        return (
            df.filter(F.col(end) > F.col(start))
            .filter(hi - lo < max_buckets_per_interval)
            .withColumn(f"__lo_{side}", lo)
            .withColumn(f"__bucket_{side}", F.explode(F.sequence(lo, hi)))
        )

    ab = bucketize(a, a_start, a_end, "a")
    bb = bucketize(b, b_start, b_end, "b").withColumnRenamed(on, "__on_b")
    return (
        ab.join(
            bb,
            (F.col(on) == F.col("__on_b"))
            & (F.col("__bucket_a") == F.col("__bucket_b")),
        )
        # exact refine
        .filter((F.col(a_start) < F.col(b_end)) & (F.col(b_start) < F.col(a_end)))
        # emit each pair once: only in the first bucket both intervals touch
        .filter(F.col("__bucket_a") == F.greatest(F.col("__lo_a"), F.col("__lo_b")))
        .drop("__bucket_a", "__bucket_b", "__lo_a", "__lo_b", "__on_b")
    )
