"""Streaming hexagonal cell counts (streaming twin of the batch
`hex_bin_density` query).

Unlike the S2 twin (whose Hilbert walk needs an Arrow kernel), the hex
assignment (functions/hexgrid.py) is ONE flat codegen expression — a
4-candidate struct-array argmin — so the entire stream stays JVM-side:
point stream -> hex cell projection -> watermarked tumbling-window
per-cell counts. No Python anywhere, the strongest streaming posture an
indexed aggregation can have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.functions.hexgrid import HEX_SX, HEX_SY, hex_cell_cols


def streaming_hex_counts(
    point_stream: DataFrame,
    sx: int = HEX_SX,
    sy: int = HEX_SY,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts: str = "ts",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """(ts, x, y) stream -> watermarked windowed (win, hr, hc, n)."""
    c = hex_cell_cols(F.col(x), F.col(y), sx=sx, sy=sy)
    return (
        point_stream.select(
            F.col(ts), c["hr"].alias("hr"), c["hc"].alias("hc")
        )
        .withWatermark(ts, watermark)
        .groupBy(F.window(ts, window).alias("win"), "hr", "hc")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("win", "hr", "hc", "n")
    )
