"""As-of (nearest-predecessor) join — an operator Spark has no builtin for.

For every left row, attach the payload of the single right row with the
same key whose timestamp is the greatest one <= the left timestamp
(optionally within a tolerance window). This is the canonical
point-in-time lookup of event pipelines: "the last `view` before each
`error`", "the prevailing exchange rate at order time", "the sensor
reading in force at sample time". DuckDB/Pandas expose it as ASOF JOIN /
merge_asof; Spark does not, and the naive formulations are scale traps:

  - range-join (left.ts >= right.ts, pick max): Catalyst plans a
    cartesian-per-key product — O(L*R) per key, quadratic on hot keys.
  - per-key collect + bisect in Python: driver-bound or UDF-heavy.

The shape that survives 100 TB is the UNION + ordered-window scan:

  1. tag both sides and union them on an aligned slim schema
     (key, ts, side, right-payload struct | null),
  2. one hash shuffle on the key (the only shuffle in the plan),
  3. in-partition sort by (ts, side, seq) — right rows sort BEFORE left
     rows at equal ts, giving the inclusive `left.ts >= right.ts` bound,
  4. `last(payload, ignorenulls=True)` over rows UNBOUNDED PRECEDING ..
     CURRENT ROW carries the most recent right payload forward,
  5. keep the left rows.

Cost: one shuffle of (|L| + |R|) slim rows + a per-partition sort —
the same plan Spark would run for any window aggregate, with partial
ordering handled by the sort-based window exec. There is no join
explosion, no per-key product, and the right payload travels as a single
struct column. Per-key colocation is inherent to as-of semantics (every
formulation needs a key's timeline in one place); the skew escape hatch
at planet scale is time-bucketing — chunk each hot key's timeline into
ranges, run the same window per chunk, and carry each chunk's last
payload into the next chunk's seed row (not implemented here; no fixture
key is remotely hot enough).

Determinism: when several right rows share (key, ts), the window's
(ts, side, seq) order makes `last()` pick the one with the greatest
`seq`; callers who need engine-agnostic results should dedupe the right
side per (key, ts) first (the driver query does — its DuckDB ASOF JOIN
twin leaves equal-ts winners unspecified otherwise).

Reference parity note: the reference has no temporal operator family —
this is a north-star addition for the interleaved event stream
(SURVEY.md section 2.5 gap list), following the same "composition of
built-in relational ops, zero Python in the hot path" rule as J1/J2
(/root/reference/src/main/scala/.../NodeJoiner.scala:40-70 is the
closest analog: a keyed reconstruction that must colocate per key).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    seq: str | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row with right_ts <= left_ts per key.

    Returns every `left` row (left-outer semantics) plus one column per
    name in `right_payload`, prefixed `asof_` — NULL when the key has no
    right row at or before the left timestamp (or none within
    `tolerance_us` microseconds, when given).

    on            join key column names (present in both frames)
    left_ts /     timestamp columns; compared on microsecond precision
    right_ts      (`unix_micros`), so NTZ parquet timestamps are exact.
    right_payload right columns to attach (each becomes `asof_<name>`)
    seq           optional right-side total-order tiebreak column for
                  equal (key, ts) rows; the greatest wins
    tolerance_us  optional max allowed left_ts - right_ts gap
    """
    on = list(on)
    payload = list(right_payload)
    # The carried struct keeps the matched timestamp so tolerance can be
    # applied after the window without a second pass over the right side.
    r_struct = F.struct(
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__ts_us"),
        *[F.col(c).alias(c) for c in payload],
    )
    # Both sides' payloads ride the union as single struct columns (null
    # on the other side), so the whole operator is ONE shuffle + sort —
    # no row-id join-back, which would shuffle a second time.
    left_cols = [c for c in left.columns]
    l_struct = F.struct(*[F.col(c).alias(c) for c in left_cols])
    r = right.select(
        *on,
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__us"),
        F.lit(0).alias("__side"),
        (F.col(seq) if seq else F.lit(0)).cast("bigint").alias("__seq"),
        r_struct.alias("__r"),
        F.lit(None).cast(left.select(l_struct).schema[0].dataType).alias("__l"),
    )
    l = left.select(
        *on,
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("__us"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("bigint").alias("__seq"),
        F.lit(None).cast(right.select(r_struct).schema[0].dataType).alias("__r"),
        l_struct.alias("__l"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__us", "__side", "__seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.unionByName(l)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_us is not None:
        out = out.withColumn(
            "__m",
            F.when(
                F.col("__us") - F.col("__m.__ts_us") <= F.lit(tolerance_us),
                F.col("__m"),
            ),
        )
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        *[F.col(f"__m.{c}").alias(f"asof_{c}") for c in payload],
        F.col("__m.__ts_us").alias("asof_ts_us"),
    )
