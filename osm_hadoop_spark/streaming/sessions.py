"""Streaming sessionization via native session_window (engine addition).

The batch engine sessionizes with a lag-window gap rule
(__spark_entry__.py::_q_sessionize); the streaming twin uses Spark's
built-in `session_window` — a dynamic-gap window whose state merges
adjacent windows as events arrive, with the watermark bounding state
(closed sessions older than the watermark are emitted and dropped).
This stays entirely in the engine's native streaming state store: no
applyInPandasWithState, no Python in the loop — the right tool when the
semantics ARE Spark's built-in, per the engine's operator rules.

Equivalence contract (pinned by test): with the same gap, the final
session count and per-session event counts equal the batch lag-rule
answer over the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_user_sessions"]


def streaming_user_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """events(user_id, ts, value) -> one row per closed session:
    (user_id, session_start, session_end, n_events, sum_value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
