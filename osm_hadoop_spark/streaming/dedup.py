"""Stateful streaming dedup (engine addition; training-data pipeline op).

Exact first-occurrence-wins deduplication over an unbounded document
stream via `applyInPandasWithState` — the sanctioned custom-stateful form
(SURVEY.md section 2.7). Grouping key is the document fingerprint (any
deterministic hash column); state per key is a single "seen" flag, so
state size is O(distinct fingerprints) and Spark partitions it by key —
the same hash-partitioned layout the batch `dedup_exact` groupBy uses,
just incremental.

`state_ttl_ms` bounds state for truly unbounded streams via a
ProcessingTimeTimeout: a fingerprint unseen for that long is evicted
(trades exactness across the horizon for bounded state — the standard
production compromise). The default (None) keeps state forever, exact.

The survivor within a micro-batch is chosen by MIN(order_col), not by
arrival position: Spark does not guarantee intra-batch row order into the
state function, so "first row of the first chunk" is nondeterministic
across retries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "fingerprint bigint, doc_id string, n_dupes_dropped bigint"
_STATE_SCHEMA = "seen boolean, dropped bigint"


def _make_dedup_fn(state_ttl_ms: int | None):
    def _dedup_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen, dropped = state.get if state.exists else (False, 0)
        first_doc = None
        batch_rows = 0
        for pdf in pdfs:
            if pdf.shape[0] == 0:
                continue
            batch_rows += pdf.shape[0]
            # deterministic survivor: minimum order key across ALL chunks
            chunk_min = pdf["doc_id"].min()
            if first_doc is None or chunk_min < first_doc:
                first_doc = chunk_min
        if batch_rows == 0:
            return
        if seen:
            state.update((True, int(dropped) + batch_rows))
        else:
            state.update((True, int(dropped) + batch_rows - 1))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if not seen:
            yield pd.DataFrame({
                "fingerprint": [key[0]],
                "doc_id": [first_doc],
                "n_dupes_dropped": [batch_rows - 1],
            })

    return _dedup_fn


def streaming_dedup_exact(
    doc_stream: DataFrame,
    fingerprint_col: str = "fingerprint",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """doc_stream(doc_id, <fingerprint_col>) -> stream of first occurrences.

    Emits one row per fingerprint the first time it is seen (update-mode
    output); duplicates within and across micro-batches are dropped and
    counted into the per-key state. With `state_ttl_ms`, a key idle that
    long is evicted and its next occurrence re-emitted (bounded state)."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        doc_stream.select(F.col(fingerprint_col).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _make_dedup_fn(state_ttl_ms),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
