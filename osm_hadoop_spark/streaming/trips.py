"""Stateful streaming trip segmentation (streaming twin of
operators/trajectory.py::segment_trips).

Pings (entity, ping_id, ts_us, x, y) are folded per entity with
`applyInPandasWithState`; the break rule is identical to the batch
operator (first ping / time gap > gap_us / squared jump > jump^2).
Every micro-batch emits an UPDATED rollup row for each trip it touched —
a trip closed in an earlier batch is never touched again, so "latest row
per (entity, trip)" converges to exactly the batch rollup
(batch-equivalence across a micro-batch boundary pinned in
tests/test_pipeline_and_skew.py).

State per entity is O(1): the last ping (ts, x, y) plus the OPEN trip's
accumulators (index, start, count, length) — seven bigints regardless of
history length, the same minimal-state discipline as streaming/asof.py.
Within a micro-batch rows are replayed in (ts_us, ping_id) order, so
intra-batch disorder is absorbed; across batches the standard streaming
contract applies (per-entity time-ordered arrival — enforce upstream
with a watermark + sorted sink if the transport reorders).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id bigint, trip bigint, n_pings bigint, start_us bigint, "
    "end_us bigint, manhattan_len bigint"
)
_STATE_SCHEMA = (
    "last_ts bigint, last_x bigint, last_y bigint, trip bigint, "
    "start_us bigint, n_pings bigint, mlen bigint"
)


def _make_fn(gap_us: int, jump: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, last_x, last_y, trip, start, n, ml = state.get
        else:
            last_ts = last_x = last_y = None
            trip, start, n, ml = -1, 0, 0, 0
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(t), int(p), int(x), int(y))
                for t, p, x, y in zip(
                    pdf["ts_us"], pdf["ping_id"], pdf["x"], pdf["y"]
                )
            )
        rows.sort()
        touched: dict[int, tuple] = {}
        for ts, _pid, x, y in rows:
            brk = (
                last_ts is None
                or ts - last_ts > gap_us
                or (x - last_x) ** 2 + (y - last_y) ** 2 > jump * jump
            )
            if brk:
                trip, start, n, ml = trip + 1, ts, 1, 0
            else:
                n += 1
                ml += abs(x - last_x) + abs(y - last_y)
            last_ts, last_x, last_y = ts, x, y
            touched[trip] = (start, n, ml, ts)
        if rows:
            state.update((last_ts, last_x, last_y, trip, start, n, ml))
            yield pd.DataFrame(
                [
                    {
                        "user_id": int(key[0]),
                        "trip": t,
                        "n_pings": nn,
                        "start_us": st,
                        "end_us": end,
                        "manhattan_len": mm,
                    }
                    for t, (st, nn, mm, end) in touched.items()
                ]
            )

    return fn


def streaming_trip_segments(
    pings: DataFrame, gap_us: int, jump: int
) -> DataFrame:
    """pings(user_id, ping_id, ts_us, x, y) -> per-trip rollup updates
    (update mode): latest row per (user_id, trip) equals the batch
    segment_trips result."""
    return (
        pings.select("user_id", "ping_id", "ts_us", "x", "y")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_fn(gap_us, jump),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
