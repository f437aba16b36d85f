"""Streaming Count-Min sketch (streaming twin of
operators/sketch.py::count_min_cells).

Keyed events become a per-event-time-window CM sketch table: each key
fans out statelessly to its d (row, column) cells BEFORE aggregation, so
the whole query carries exactly ONE stateful operator — a watermarked
tumbling-window sum over at most d*w cells per window (the
streaming/kde.py shape). The sketch state per window is bounded by d*w
REGARDLESS of stream rate or key cardinality — the defining property of
a sketch, and exactly why it is the right streaming frequency structure:
a per-key windowed count would hold state proportional to distinct keys.

Cell arithmetic is the batch operator's verbatim (same h60 hash, same
column formula), so per-window batch equivalence is a direct cross-check
(tests/test_pipeline_and_skew.py pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


def streaming_count_min(
    events: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 64,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """events(ts timestamp, <key_col>) -> (win, r, c, cnt) per tumbling
    event-time window (append mode once the watermark closes a window)."""
    rows = events.withWatermark("ts", watermark).select(
        "ts",
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    )
    c = h60(
        F.concat(F.lit("cm"), F.col("r").cast("string"), F.lit("_"), F.col("k"))
    ) % w
    return (
        rows.select("ts", "r", c.alias("c"))
        .groupBy(F.window("ts", window).alias("win"), "r", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
