"""Stateful streaming changeset application (streaming twin of
operators/diff.py::apply_diff).

An unbounded stream of versioned entity rows (an OSM minutely-diff feed)
is folded into latest-visible-version state per entity via
`applyInPandasWithState` — the same osmosis snapshot rules as the batch
operator: highest version wins, late/stale rows are ignored, a winning
visible=false row is a delete. Output (update mode) emits one row per
entity whose current version CHANGED in the micro-batch, with `visible`
carried so a downstream sink can apply deletes.

State per key is (version, visible) — O(live entities), hash-partitioned
by entity id, the streaming analog of the batch window shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "entity_id bigint, version bigint, visible boolean, tag string"
_STATE_SCHEMA = "version bigint, visible boolean, tag string"


def _upsert_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cur_v, cur_vis, cur_tag = state.get if state.exists else (-1, False, None)
    best = None  # (version, visible, tag) best row of this batch
    for pdf in pdfs:
        for v, vis, tag in zip(pdf["version"], pdf["visible"], pdf["tag"]):
            v = int(v)
            # within a batch the highest version wins; ties keep the later
            # state update only if it differs — versions are a total order
            # per entity in OSM, equal-version rows are identical
            if best is None or v > best[0]:
                best = (v, bool(vis), tag)
    if best is None or best[0] <= int(cur_v):
        return  # stale batch: nothing newer than current state
    state.update(best)
    yield pd.DataFrame(
        [
            {
                "entity_id": int(key[0]),
                "version": best[0],
                "visible": best[1],
                "tag": best[2],
            }
        ]
    )


def streaming_apply_diff(entity_stream: DataFrame) -> DataFrame:
    """entity_stream(entity_id, version, visible, tag) -> stream of entity
    rows whose latest version changed (update mode; visible=false rows are
    deletes for the downstream sink)."""
    return (
        entity_stream.select("entity_id", "version", "visible", "tag")
        .groupBy("entity_id")
        .applyInPandasWithState(
            _upsert_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
