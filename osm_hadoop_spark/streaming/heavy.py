"""Streaming heavy hitters: sharded mergeable Misra-Gries summaries
(engine addition; the streaming twin of the batch
`sketch.py::heavy_hitters` Misra-Gries path).

The batch operator can recount candidates exactly in a second pass; a
stream cannot, so this is the honest bounded-state form: each of
`shards` state groups keeps a Misra-Gries summary of at most `k`
counters plus two integers (items seen `n`, total decrement mass `d`).
State is O(shards * k) REGARDLESS of stream rate or key cardinality — a
per-key windowed count would hold state proportional to distinct keys.

Sharding is the scale story: a single global summary would serialize the
whole stream through one state task; hashing keys into `shards` groups
keeps the stateful operator parallel, and because the assignment is BY
KEY, each key's true count lives entirely in one shard — the per-shard
Misra-Gries guarantees therefore apply to global counts:

    est(key) <= true(key) <= est(key) + d_shard,   and
    d_shard  <= n_shard / (k + 1)

(each decrement of `dec` removes at least (k+1)*dec mass, per-batch
merge included — the mergeable-summaries argument of Agarwal et al.
2013, PODS '12). Any key with true count > d_shard is guaranteed
tracked. All three invariants are pinned by the pytest.

Per micro-batch the fold is deterministic: batch rows are pre-aggregated
to (key, weight) and folded in sorted key order, and the k-boundary
tie-break is (-count, key), so replay produces identical summaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from osm_hadoop_spark.operators.textstats import h60

_OUT_SCHEMA = (
    "shard int, key string, est bigint, n_shard bigint, d_shard bigint"
)
_STATE_SCHEMA = "ks array<string>, cs array<bigint>, n bigint, d bigint"


def _make_mg_fn(k: int):
    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ks, cs, n, d = state.get
            counters = dict(zip(ks, (int(c) for c in cs)))
            n, d = int(n), int(d)
        else:
            counters, n, d = {}, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.shape[0] == 0:
            return
        vc = rows["k"].value_counts()
        for kk in sorted(vc.index):
            w = int(vc[kk])
            n += w
            counters[kk] = counters.get(kk, 0) + w
        if len(counters) > k:
            # mergeable-summaries reduction: subtract the (k+1)-th
            # largest count from everything, evict the non-positive.
            ranked = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
            dec = ranked[k][1]
            d += dec
            counters = {kk: c - dec for kk, c in ranked[:k] if c > dec}
        out_keys = sorted(counters)
        state.update((
            out_keys, [counters[kk] for kk in out_keys], n, d,
        ))
        yield pd.DataFrame({
            "shard": [key[0]] * len(out_keys),
            "key": out_keys,
            "est": [counters[kk] for kk in out_keys],
            "n_shard": [n] * len(out_keys),
            "d_shard": [d] * len(out_keys),
        })

    return _fn


def streaming_heavy_hitters(
    events: DataFrame, key_col: str, k: int = 8, shards: int = 4,
) -> DataFrame:
    """events(<key_col>, ...) -> per-shard Misra-Gries summary after each
    micro-batch (update mode): (shard, key, est, n_shard, d_shard)."""
    tagged = events.select(
        F.col(key_col).cast("string").alias("k"),
        (h60(F.col(key_col).cast("string")) % shards).cast("int").alias("shard"),
    )
    return tagged.groupBy("shard").applyInPandasWithState(
        _make_mg_fn(k),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
