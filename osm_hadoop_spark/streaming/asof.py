"""Stateful streaming as-of enrichment (streaming twin of
operators/asof.py::asof_join).

A mixed stream of keyed, timestamped events — `side = 0` rows are the
reference series (e.g. views / exchange rates), `side = 1` rows are the
ones to enrich (e.g. errors / orders) — is folded per key with
`applyInPandasWithState`: state holds the latest reference row seen, and
every side-1 row is emitted with the reference row in force at its
timestamp. Within a micro-batch rows are replayed in full (ts, side,
seq) order — reference rows sort BEFORE enrichable rows at equal ts, the
same inclusive bound as the batch operator — so intra-batch disorder is
absorbed. Across batches the streaming contract applies: a reference row
arriving AFTER an already-emitted enrichable row cannot retro-enrich it
(the batch operator is the replayable ground truth; the equivalence
holds exactly when batches arrive time-ordered, which the test pins).

State per key is ONE (ts, id) pair — O(keys), not O(events): this is the
smallest state any as-of semantics can carry, and the reason the
streaming form scales to planet keyspaces where buffering timelines
would not.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id bigint, event_id bigint, ts_us bigint, match_id bigint, gap_us bigint"
)
_STATE_SCHEMA = "r_ts bigint, r_id bigint"


def _asof_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    r_ts, r_id = state.get if state.exists else (None, None)
    rows = []
    for pdf in pdfs:
        for ts, side, eid in zip(pdf["ts_us"], pdf["side"], pdf["event_id"]):
            rows.append((int(ts), int(side), int(eid)))
    rows.sort()  # (ts, side, id): reference rows first at equal ts
    out = []
    for ts, side, eid in rows:
        if side == 0:
            if r_ts is None or (ts, eid) > (r_ts, r_id):
                r_ts, r_id = ts, eid
        else:
            out.append(
                {
                    "user_id": int(key[0]),
                    "event_id": eid,
                    "ts_us": ts,
                    "match_id": r_id if r_ts is not None else -1,
                    "gap_us": ts - r_ts if r_ts is not None else -1,
                }
            )
    if r_ts is not None:
        state.update((r_ts, r_id))
    if out:
        yield pd.DataFrame(out)


def streaming_asof_enrich(events: DataFrame) -> DataFrame:
    """events(user_id, event_id, ts_us, side) -> enriched side-1 rows
    (append mode): each with the latest side-0 event at or before it."""
    return (
        events.select("user_id", "event_id", "ts_us", "side")
        .groupBy("user_id")
        .applyInPandasWithState(
            _asof_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
