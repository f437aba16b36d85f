"""Marketing-touch attribution: first/last-touch credit within a lookback.

The analytics twin of the funnel operator: every CONVERSION event is
credited to marketing TOUCH events of the same user inside a lookback
window — last-touch (the industry default), first-touch, or both for
position-based blends. GA4/Adjust-style pipelines run exactly this rule
over event streams.

Semantics (pure function of the input):
  - a conversion at time t attributes within the half-open lookback
    (t - w, t): touches strictly BEFORE the conversion, within w;
  - last touch = max (ts, seq) in the window, first = min (ts, seq) —
    the seq column is the deterministic tie-break for same-timestamp
    touches (the engine-wide (ts, id) ordering discipline);
  - conversions with no touch in the window keep NULL attribution (the
    "direct / unattributed" bucket real reports carry).

Plan: union touches + conversions once, ONE sort per user on (ts), and
two RANGE-frame window aggregates (max/min of a (ts, seq, channel)
struct over range (-w, -1)) — no self-join, no second exchange; the
struct is NULL on conversion rows so conversions never attribute to
each other. Whole-stage codegen end to end.

100 TB posture: the only shuffle key is the user id; window state is
O(touches in window) per user via the range frame — bounded by w, and
the union projects only (user, ts, seq, channel), never payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attribute_conversions(
    touches: DataFrame,
    conversions: DataFrame,
    lookback: int,
    user: str = "user_id",
    ts: str = "ts_us",
    seq: str = "event_id",
    channel: str = "channel",
) -> DataFrame:
    """touches(user, ts, seq, channel) x conversions(user, ts, seq) ->
    one row per conversion: (user, conv_id, conv_ts, lt_id, lt_channel,
    ft_id, ft_channel); lt_*/ft_* NULL when unattributed."""
    t = touches.select(
        F.col(user).alias("u"), F.col(ts).alias("t"), F.col(seq).alias("s"),
        F.struct(
            F.col(ts).alias("ts"), F.col(seq).alias("seq"),
            F.col(channel).alias("ch"),
        ).alias("touch"),
        F.lit(False).alias("is_conv"),
    )
    c = conversions.select(
        F.col(user).alias("u"), F.col(ts).alias("t"), F.col(seq).alias("s"),
        F.lit(None).cast(t.schema["touch"].dataType).alias("touch"),
        F.lit(True).alias("is_conv"),
    )
    w = (
        Window.partitionBy("u")
        .orderBy(F.col("t").cast("long"))
        .rangeBetween(-lookback + 1, -1)
    )
    out = (
        t.unionByName(c)
        .withColumn("lt", F.max("touch").over(w))
        .withColumn("ft", F.min("touch").over(w))
        .filter(F.col("is_conv"))
    )
    return out.select(
        F.col("u").alias(user),
        F.col("s").alias("conv_id"),
        F.col("t").alias("conv_ts"),
        F.col("lt.seq").alias("lt_id"),
        F.col("lt.ch").alias("lt_channel"),
        F.col("ft.seq").alias("ft_id"),
        F.col("ft.ch").alias("ft_channel"),
    )
