"""Streaming kernel-density heatmap (streaming twin of
operators/kde.py::kde_grid).

Pings (ts, x, y) become a per-event-time-window density surface: every
ping contributes w(dx, dy) = (r+1-|dx|)*(r+1-|dy|) to the (2r+1)^2 cells
around it. The trick that keeps this a PLAIN append-mode stream: the
kernel fan-out is STATELESS (explode the offsets before aggregating), so
the whole query has exactly ONE stateful operator — a watermarked
tumbling-window sum — instead of the chained windowed aggregations the
batch operator's separable two-pass form would need. The fan-out
multiplies the pre-aggregation stream (2r+1)^2-fold, the price of
single-pass streaming; the batch operator fans out the (much smaller)
occupied-cell relation instead, which is why the two implementations
differ and why the equivalence test (batch kde_grid per window ==
streaming rows, tests/test_pipeline_and_skew.py) is a real cross-check
of both.

Everything is JVM codegen below the window agg; densities are exact
integers (same kernel as the batch operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_kde(
    pings: DataFrame,
    cell_size: int,
    radius: int,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """pings(ts timestamp, x bigint, y bigint) -> (window, cx, cy,
    density) per tumbling event-time window (append mode)."""
    off = F.sequence(F.lit(-radius), F.lit(radius))
    w = lambda d: F.lit(radius + 1) - F.abs(d)  # noqa: E731
    contrib = (
        pings.withWatermark("ts", watermark)
        .withColumn("_dx", F.explode(off))
        .withColumn("_dy", F.explode(off))
        .select(
            "ts",
            (F.floor(F.col("x") / cell_size) + F.col("_dx")).alias("cx"),
            (F.floor(F.col("y") / cell_size) + F.col("_dy")).alias("cy"),
            (w(F.col("_dx")) * w(F.col("_dy"))).cast("bigint").alias("_w"),
        )
    )
    return contrib.groupBy(
        F.window("ts", window).alias("win"), "cx", "cy"
    ).agg(F.sum("_w").alias("density"))
