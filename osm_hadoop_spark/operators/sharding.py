"""Rendezvous (highest-random-weight) shard assignment.

The cluster-side primitive behind stable routing of keys to a dynamic set
of shards (Thaler & Ravishankar 1998): each key goes to the shard with the
highest hash score h(key, shard). Unlike mod-N hashing, adding a shard
moves ONLY the keys the new shard now wins (expected 1/(n+1) of them) —
the property that makes stateful serving, cache tiering, and incremental
snapshot re-bucketing cheap. The engine uses it for deterministic
re-bucketing plans over snapshot tables (sources/catalog.py bucketing
writes a static layout; HRW gives the migration DIFF when the bucket
count changes).

Execution shape: the shard list is a literal array, the argmax is one
codegen projection (transform -> array_max over (score, shard) structs) —
map-only, zero shuffle, zero Python; the score is the engine-wide h60 so
the oracle re-derives assignments exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


def hrw_score(key: Column, shard: Column) -> Column:
    """h60 over the canonical 'key@shard' pairing string."""
    return h60(F.concat(key.cast("string"), F.lit("@"), shard))


def hrw_assign(
    df: DataFrame, key_col: str, shards: list[str], out_col: str = "shard"
) -> DataFrame:
    """Append the winning shard per row (ties break to the larger shard
    name — struct max semantics, replicated in the oracle)."""
    arr = F.array(
        *[
            F.struct(
                hrw_score(F.col(key_col), F.lit(s)).alias("score"),
                F.lit(s).alias("shard"),
            )
            for s in shards
        ]
    )
    return df.withColumn(out_col, F.array_max(arr)["shard"])


def hrw_migration(
    df: DataFrame, key_col: str, shards: list[str], added: str
) -> DataFrame:
    """Assignment churn when `added` joins `shards`: per (old_shard,
    new_shard) key counts. Rendezvous guarantees every moved key lands on
    the ADDED shard (old != new implies new == added) — pinned by
    tests/test_sharding.py; this query exposes the migration plan a
    re-bucketing job would execute."""
    a = hrw_assign(df, key_col, shards, "old_shard")
    b = hrw_assign(a, key_col, shards + [added], "new_shard")
    return b.groupBy("old_shard", "new_shard").agg(
        F.count(F.lit(1)).alias("n_keys")
    )
