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
