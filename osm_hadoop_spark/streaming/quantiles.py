"""Streaming deterministic quantile summaries — the streaming twin of
the batch MRL sketch (operators/quantile_sketch.py), in the
streaming/heavy.py mold.

The batch operator compacts level-synchronized over the whole input; a
stream cannot see the whole input, so this is the honest incremental
form: each of `shards` state groups holds ONE bounded summary (<= k
weighted items) and folds every micro-batch with the SAME
deterministic pair-absorb rule — sort by (value, id), pair consecutive
items, keep left on even / right on odd compaction (a per-shard
compaction counter in state drives the alternation), kept item absorbs
its partner's weight, odd trailing item survives.  Total weight is
conserved EXACTLY (sum(w) == items seen), state is O(shards * k)
regardless of stream rate or value cardinality, and the per-batch fold
is a pure function of (state, batch multiset) — replay produces
identical summaries, pinned by the pytest's plain-Python fold.

Rank error follows the MRL argument: each compaction perturbs any rank
by at most the largest pair weight, weights grow only by absorption,
so error stays O(n_shard / k) — asserted empirically in tests.

Sharding parallelizes the stateful operator exactly as in heavy.py;
estimates come from merging the <= shards*k summary rows downstream
(cumulative weight scan — a bounded relation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from osm_hadoop_spark.operators.textstats import h60

_OUT_SCHEMA = "shard int, value bigint, id bigint, w bigint, n_shard bigint"
_STATE_SCHEMA = (
    "vs array<bigint>, ids array<bigint>, ws array<bigint>, "
    "n bigint, ncomp bigint"
)


def fold_compact(items, k: int, ncomp: int):
    """Compact a sorted [(value, id, w)] list to <= k items with the
    alternating pair-absorb rule; returns (items, ncomp).  Module-level
    so the pytest replays the IDENTICAL code path."""
    while len(items) > k:
        parity = ncomp % 2
        out = []
        i = 0
        while i + 1 < len(items):
            a, b = items[i], items[i + 1]
            keep = a if parity == 0 else b
            out.append((keep[0], keep[1], a[2] + b[2]))
            i += 2
        if i < len(items):
            out.append(items[i])
        items = out
        ncomp += 1
    return items, ncomp


def _make_fn(k: int):
    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vs, ids, ws, n, ncomp = state.get
            items = [
                (int(v), int(i), int(w)) for v, i, w in zip(vs, ids, ws)
            ]
            n, ncomp = int(n), int(ncomp)
        else:
            items, n, ncomp = [], 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.shape[0] == 0:
            return
        fresh = [
            (int(v), int(i), 1)
            for v, i in zip(rows["value"], rows["id"])
        ]
        n += len(fresh)
        items = sorted(items + fresh)
        items, ncomp = fold_compact(items, k, ncomp)
        state.update((
            [it[0] for it in items],
            [it[1] for it in items],
            [it[2] for it in items],
            n,
            ncomp,
        ))
        yield pd.DataFrame({
            "shard": [key[0]] * len(items),
            "value": [it[0] for it in items],
            "id": [it[1] for it in items],
            "w": [it[2] for it in items],
            "n_shard": [n] * len(items),
        })

    return _fn


def streaming_quantile_summary(
    events: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 32,
    shards: int = 4,
) -> DataFrame:
    """events(<value_col>, <id_col> unique, ...) -> per-shard bounded
    summary after each micro-batch (update mode):
    (shard, value, id, w, n_shard)."""
    tagged = events.select(
        F.col(value_col).cast("bigint").alias("value"),
        F.col(id_col).cast("bigint").alias("id"),
        (h60(F.col(id_col).cast("string")) % shards).cast("int")
        .alias("shard"),
    )
    return tagged.groupBy("shard").applyInPandasWithState(
        _make_fn(k),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
