"""Ordered funnel analysis: earliest step chain per user.

The product-analytics primitive (Amplitude/Mixpanel "funnels"): for an
ordered list of step event types, find for each user the EARLIEST chain
  t1 = first step-1 event,
  t2 = first step-2 event strictly after t1 and within `window_us` of t1,
  t3 = first step-3 event strictly after t2 and within `window_us` of t2,
and report how deep the user got.  "First/after" are defined on the
total order (ts, event_id) so simultaneous timestamps are deterministic.

Semantics are PINNED to greedy first-match (the Amplitude/Mixpanel
convention): each stage takes the first eligible event after the
previous stage's match.  Note this is deliberately NOT the
depth-maximal chain — with per-step windows a later step-2 event can
extend the step-3 window and reach deeper, and such chains do not
count (tests/test_funnel.py pins one such case).

Plan: ONE hash aggregation per user collecting (ts, event_id, step)
structs — only funnel-step events survive the pushed filter — then
`array_sort` + a single `F.aggregate` FOLD over the sorted array builds
the whole chain inside whole-stage codegen: no window functions, no
joins, no Python.

100 TB posture: the only exchange is the per-user partial agg; per-user
state is the user's own step events (bounded by the funnel filter), and
the fold is O(n) per user.  The DuckDB oracle deliberately uses a
DIFFERENT mechanism — a chain of per-stage row_number()=1 joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    window_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Earliest step chain per user.

    Returns DataFrame(user_id, depth, t1_us, e1, ..., tk_us, ek) with
    -1 for stages never reached (k = len(steps)).
    """
    k = len(steps)
    step_no = F.lit(None).cast("int")
    for i, s in enumerate(reversed(steps)):
        step_no = F.when(F.col(type_col) == s, F.lit(k - 1 - i + 1)).otherwise(step_no)

    rows = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user_id"),
        F.struct(
            F.col(ts_col).cast("long").alias("ts"),
            F.col(id_col).cast("long").alias("eid"),
            step_no.alias("step"),
        ).alias("ev"),
    )

    fields = [f for i in range(1, k + 1) for f in (f"t{i}", f"e{i}")]
    init = F.struct(
        *[F.lit(None).cast("long").alias(f) for f in fields]
    )

    def merge(acc: Column, x: Column) -> Column:
        outs = []
        for i in range(1, k + 1):
            if i == 1:
                take = (x["step"] == 1) & acc["t1"].isNull()
            else:
                prev_t, prev_e = acc[f"t{i-1}"], acc[f"e{i-1}"]
                after = (x["ts"] > prev_t) | (
                    (x["ts"] == prev_t) & (x["eid"] > prev_e)
                )
                take = (
                    (x["step"] == i)
                    & acc[f"t{i}"].isNull()
                    & prev_t.isNotNull()
                    & after
                    & (x["ts"] - prev_t <= window_us)
                )
            outs.append(F.when(take, x["ts"]).otherwise(acc[f"t{i}"]).alias(f"t{i}"))
            outs.append(F.when(take, x["eid"]).otherwise(acc[f"e{i}"]).alias(f"e{i}"))
        return F.struct(*outs)

    folded = (
        rows.groupBy("user_id")
        .agg(F.array_sort(F.collect_list("ev")).alias("evs"))
        .select(
            "user_id",
            F.aggregate(F.col("evs"), init, merge).alias("acc"),
        )
    )
    depth = F.lit(0)
    for i in range(1, k + 1):
        depth = F.when(F.col(f"acc.t{i}").isNotNull(), F.lit(i)).otherwise(depth)
    return folded.select(
        "user_id",
        depth.cast("int").alias("depth"),
        *[
            F.coalesce(F.col(f"acc.{f}"), F.lit(-1)).alias(
                f"t{i}_us" if f.startswith("t") else f"e{i}"
            )
            for i in range(1, k + 1)
            for f in (f"t{i}", f"e{i}")
        ],
    )
