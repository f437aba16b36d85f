"""Watermarked stream-stream interval join (§2.7 — attribution shape).

The streaming twin of operators/interval_join.py + asof.py: join two live
event streams on a key within an event-time range (view -> click
attribution, request -> response pairing, sensor -> actuation latency).
Spark's stream-stream join keeps both sides in state; the two watermarks
PLUS the range predicate bound that state — without the time bound the
state is unbounded and the query is rejected, so the operator makes the
bound part of its signature rather than an option.

Semantics: inner join, left event at t matches right events in
(t, t + max_delay]. Append-mode safe. State per key is bounded by
max_delay + watermark slack — the documented contract for running this
at production volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_attribution_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """left(key, l_ts, ...) x right(key, r_ts, ...) ->
    rows where r_ts in (l_ts, l_ts + max_delay]."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] > lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
