"""Streaming S2 cell counts (engine addition, streaming twin of the
batch `s2_cell_assign_l12` query).

documents stream (+ ingest_ts) -> span parse (JVM from_json) -> S2 cell
assignment via the vectorized NumPy kernel inside `mapInPandas` (a
sanctioned Arrow form, SURVEY.md section 2.7 — the Hilbert walk cannot be
a flat SQL expression: each level's orientation state would duplicate the
whole upstream expression tree, 2^level growth) -> watermarked
tumbling-window per-cell counts.

mapInPandas is stateless, so it composes with Structured Streaming; the
watermark is declared on the event-time column AFTER the map (the Arrow
stage passes `ingest_ts` through untouched)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_s2_stream(node_stream: DataFrame, level: int) -> DataFrame:
    """(ingest_ts, lon, lat, ...) stream -> (ingest_ts, s2_cell)."""
    import pandas as pd

    def assign(batches):
        from osm_hadoop_spark.functions.s2 import cell_for_lonlat

        for b in batches:
            yield pd.DataFrame(
                {
                    "ingest_ts": b["ingest_ts"],
                    "s2_cell": cell_for_lonlat(
                        b["lon"].to_numpy(), b["lat"].to_numpy(), level
                    ),
                }
            )

    return node_stream.mapInPandas(
        assign, schema="ingest_ts timestamp, s2_cell bigint"
    )


def streaming_s2_counts(
    doc_stream: DataFrame,
    level: int = 10,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window per-S2-cell node counts over a
    document stream."""
    from osm_hadoop_spark.streaming.tiles import parse_node_stream

    cells = assign_s2_stream(parse_node_stream(doc_stream), level)
    return (
        cells.withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window).alias("win"), F.col("s2_cell"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select("win", "s2_cell", "n_nodes")
    )
