"""Sweep-line peak concurrency: max simultaneous intervals per key.

T6 in the temporal family. islands (T5) merges a key's intervals into
maximal covered spans; this answers the orthogonal question "how DEEP
does the overlap get" — peak concurrent sessions, max simultaneous
edits on an entity, connection-pool sizing. The reference has no
temporal operators at all (its OSM timestamps are dropped at parse
time, `/root/reference/src/main/scala/input/OsmEntityMapper.scala`);
this family exists because the driver's interleaved-document workload
is event-shaped.

Classic sweep line, expressed relationally:

  each [start, end) interval contributes (+1 at start) and (-1 at end);
  sort a key's events by (ts, delta) — delta ascending puts the -1
  closers BEFORE the +1 openers at equal timestamps, which is exactly
  the half-open convention (an interval ending at t does not overlap
  one starting at t); running-sum the deltas; the peak is the max
  running depth and the answer also carries the earliest instant that
  depth is reached.

Determinism under ties: events sharing (ts, delta) carry EQUAL deltas,
so within such a group every prefix permutation attains the same group
maximum (for +1 runs the max is the group total, reached at its last
row; for -1 runs it is the running value at the group's first row).
Peak and first-peak-ts are therefore order-independent even though
intermediate row depths are not — this is what lets a cross-engine
value oracle pin the result exactly.

Plan: one generator (two-struct inline per interval — no join), ONE
Exchange + Sort for the window running sum, one hash aggregate for the
per-key rollup. All-integer arithmetic.

100 TB posture: shuffle key is the entity key only; the expansion is a
fixed 2x; window state is O(1) per row; the final aggregate is
partial-aggregatable (max/min/count). Skewed keys hit the same
single-window caveat as sessionize/islands — the sort is per-key and
a pathological key serializes on one task; cap or salt upstream if a
key's interval count is unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def peak_concurrency(
    intervals: DataFrame,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
) -> DataFrame:
    """DataFrame(key, peak, first_peak_us, n_intervals).

    `peak` is the maximum number of simultaneously-open [start, end)
    intervals for the key; `first_peak_us` the earliest timestamp at
    which that depth is attained (always some interval's start);
    `n_intervals` the key's interval count.
    """
    events = intervals.select(
        F.col(key),
        F.inline(
            F.array(
                F.struct(
                    F.col(start).alias("ts"), F.lit(1).cast("bigint").alias("delta")
                ),
                F.struct(
                    F.col(end).alias("ts"), F.lit(-1).cast("bigint").alias("delta")
                ),
            )
        ),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("ts", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    depths = events.select(
        F.col(key), F.col("ts"), F.sum("delta").over(w).alias("depth")
    )
    # argmax in ONE aggregate: max(struct(depth, -ts)) is lexicographic, so
    # it selects the max depth and, among its rows, the MINIMUM ts — no
    # second window pass needed.
    best = F.max(F.struct(F.col("depth"), (-F.col("ts")).alias("nts")))
    return depths.groupBy(key).agg(
        best.alias("_b"), (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals")
    ).select(
        F.col(key),
        F.col("_b.depth").alias("peak"),
        (-F.col("_b.nts")).alias("first_peak_us"),
        "n_intervals",
    )
