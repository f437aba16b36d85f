"""Gaps-and-islands: merge overlapping/touching intervals per key.

T5 in the temporal family. interval_join (T2) pairs intervals ACROSS two
tables; this collapses intervals WITHIN a keyed table into maximal
merged spans ("islands") — coverage analysis (sensor uptime, edit
activity, availability windows) and the building block for
gap reports. Classic single-sort formulation:

  per key, ordered by (start, seq): an interval OPENS a new island iff
  its start exceeds the running maximum of all previous ends; island id
  = running count of opens; rollup per island = [min start, max end],
  interval count.

Touching intervals (start == prev max end) merge — the half-open
convention callers get from timestamps; the strict '>' is what makes
that true and is pinned in tests.

Plan: one Window (lag-style running max + running count over the same
(key, start, seq) sort — Catalyst plans ONE Exchange + ONE Sort) + one
hash aggregate; all integer arithmetic, cross-engine exact.

100 TB posture: the only shuffle key is the entity key; window state is
O(1) per row; the rollup is partial-aggregatable. Same skewed-entity
caveat as sessionize/asof/trajectory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_islands(
    intervals: DataFrame,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
    seq: str = "interval_id",
) -> DataFrame:
    """DataFrame(key, island, island_start, island_end, n_intervals) —
    island is 0-based per key in time order."""
    w = Window.partitionBy(key).orderBy(start, seq)
    prev_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    staged = intervals.select(
        F.col(key), F.col(start), F.col(end), F.col(seq),
        prev_max_end.alias("_pme"),
    )
    opens = (
        F.col("_pme").isNull() | (F.col(start) > F.col("_pme"))
    ).cast("bigint")
    lab = staged.select(
        F.col(key),
        F.col(start),
        F.col(end),
        (
            F.sum(opens).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1
        ).alias("island"),
    )
    return lab.groupBy(key, "island").agg(
        F.min(start).alias("island_start"),
        F.max(end).alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def island_gaps(intervals: DataFrame, **kw) -> DataFrame:
    """DataFrame(key, gap_start, gap_end, gap_us) — the uncovered spans
    BETWEEN a key's islands (the complement of merge_islands within the
    key's [first start, last end] hull; nothing outside the hull is a
    gap). Downtime/availability reporting in one extra window over the
    already-tiny island rollup: gap = [prev island_end, island_start)
    wherever that span is non-empty.

    Plan: merge_islands' window+agg, then one lag window over island
    rows (orders of magnitude fewer than intervals) on the SAME key
    partitioning — Catalyst adds no exchange beyond the rollup's own.
    """
    key = kw.get("key", "user_id")
    isl = merge_islands(intervals, **kw)
    w = Window.partitionBy(key).orderBy("island")
    g = isl.select(
        F.col(key),
        F.lag("island_end").over(w).alias("gap_start"),
        F.col("island_start").alias("gap_end"),
    ).where(F.col("gap_start").isNotNull())
    return g.select(
        key, "gap_start", "gap_end",
        (F.col("gap_end") - F.col("gap_start")).alias("gap_us"),
    )
