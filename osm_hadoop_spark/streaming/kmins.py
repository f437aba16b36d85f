"""Streaming k-mins distinct sketch (streaming twin of
operators/sketch.py::kmv_sketch).

Per event-time window, track the MIN hash in each of k stochastic-
averaging buckets (bucket = h60 % k) — Cohen's k-mins estimator, the
bounded-state form of KMV that a streaming MIN aggregate can maintain:
true KMV's "k smallest overall" needs a heap (unbounded merge order);
per-bucket min is a plain commutative aggregate, so the whole query is
ONE watermarked windowed min with state <= k rows per window REGARDLESS
of stream rate or key cardinality (the streaming/cm.py discipline).

Distinct estimate (driver-side, like hll_estimate): each bucket's min of
m ~ n/k uniform draws over [0, 2^60) sits near 2^60 / (m + 1), so
n̂ = k * (2^60 / min_h - 1) averaged harmonically across buckets;
tests pin accuracy, the streaming table itself stays integer-exact and
per-window batch-equivalent (same h60, same groupBy min).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


def streaming_kmins(
    events: DataFrame,
    key_col: str,
    k: int = 64,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """events(ts timestamp, <key_col>) -> (win, bucket, min_h) per
    tumbling event-time window; <= k rows of state per window."""
    h = h60(F.concat(F.lit("kmv:"), F.col(key_col).cast("string")))
    rows = events.withWatermark("ts", watermark).select(
        "ts", (h % k).alias("bucket"), h.alias("hv")
    )
    return (
        rows.groupBy(F.window("ts", window).alias("win"), "bucket")
        .agg(F.min("hv").alias("min_h"))
    )


def kmins_estimate(rows, k: int = 64) -> float:
    """Driver-side distinct estimate from collected (bucket, min_h) rows
    of ONE window (test/reporting helper, not a query path)."""
    full = 1 << 60
    ests = [full / r["min_h"] - 1 for r in rows if r["min_h"] > 0]
    if not ests:
        return 0.0
    # harmonic mean of per-bucket rates, scaled by bucket count
    hm = len(ests) / sum(1.0 / max(e, 1e-9) for e in ests)
    return k * hm
