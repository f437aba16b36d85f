"""Structured Streaming surface (engine addition — the reference is batch
only, SURVEY.md section 2.7; its restartability came from SequenceFile
checkpoints, ours from stream checkpoints + snapshot sinks).

Provides streaming ingestion of interleaved documents with event-time
windowed tile aggregation:

  documents stream (+ ingest_ts) -> span parse (JVM from_json, streaming-
  safe) -> node cell assignment via a PURE SQL slippy expression (no Python,
  so the whole stream stays in codegen) -> watermarked tumbling-window
  per-tile counts.

The SQL tile expression mirrors functions/tiles.py bit-for-bit for in-range
coordinates (floor semantics; mercator clamp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# canonical home: functions/tiles_sql.py (shared with the codegen cover)
from osm_hadoop_spark.functions.tiles_sql import (  # noqa: F401 (re-export)
    sql_xtile,
    sql_ytile,
)


def parse_node_stream(doc_stream: DataFrame) -> DataFrame:
    """Streaming-safe span parse: documents(+ingest_ts) -> node rows."""
    from osm_hadoop_spark.sources.spans import NODE_PAYLOAD_SCHEMA

    s = doc_stream.select(
        "ingest_ts", F.explode("spans").alias("span")
    ).filter(F.col("span.kind") == "osm.node")
    p = s.select("ingest_ts", F.from_json("span.text", NODE_PAYLOAD_SCHEMA).alias("n"))
    return p.select(
        "ingest_ts",
        F.col("n.id").alias("node_id"),
        F.col("n.lon").alias("lon"),
        F.col("n.lat").alias("lat"),
    ).filter(F.col("node_id").isNotNull())


def streaming_tile_counts(
    doc_stream: DataFrame,
    zoom: int = 14,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window per-tile node counts over a document
    stream — the streaming analog of J5+A4."""
    nodes = parse_node_stream(doc_stream)
    return (
        nodes.withWatermark("ingest_ts", watermark)
        .groupBy(
            F.window("ingest_ts", window).alias("win"),
            sql_xtile(F.col("lon"), zoom).alias("tx"),
            sql_ytile(F.col("lat"), zoom).alias("ty"),
        )
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select("win", "tx", "ty", "n_nodes")
    )
