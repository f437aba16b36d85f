"""Streaming modality-interleaving monitor (§2.7 twin of
operators/span_stats.py).

A live ingestion pipeline wants the kind-transition matrix per event-time
window — drift in the interleaving mix (e.g. a crawler suddenly emitting
media-only documents) is a data-quality incident you want within one
watermark delay, not at the next batch audit.

The bigram expression is IMPORTED from the batch operator
(span_stats.transition_pairs_col), so batch and stream share one codegen
expression: the whole stream stays JVM-side (array lambdas + explode +
windowed count), stateless until the watermarked window aggregate — the
cheapest possible stateful footprint (|kinds|² × windows rows of state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.span_stats import transition_pairs_col


def streaming_transition_counts(
    doc_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    spans_col: str = "spans",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """documents(+ingest_ts) stream -> per-window kind-transition counts."""
    kinds = F.expr(f"transform({spans_col}, s -> s.kind)")
    d = doc_stream.withWatermark(ts_col, watermark).select(
        ts_col, kinds.alias("_kinds")
    )
    return (
        d.select(ts_col, F.explode(transition_pairs_col("_kinds")).alias("p"))
        .groupBy(
            F.window(ts_col, window).alias("w"),
            F.col("p.kind_from").alias("kind_from"),
            F.col("p.kind_to").alias("kind_to"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .select("w", "kind_from", "kind_to", "n_transitions")
    )
