"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus job needs reproducible sampling: the same input must
select the same rows on every run, on any cluster size, with no RNG state
shared across executors. Both operators key the decision off the shared
h60 content hash (operators/textstats.py convention), so they are pure
JVM expressions (whole-stage codegen, no Python, no shuffle for the
Bernoulli case) and exactly replicable in SQL for the oracle.

  - hash_sample:      deterministic Bernoulli p = num/den per row.
                      Map-only: survives any partitioning, no shuffle.
  - stratified_sample: per-stratum rate table (small dict -> broadcast
                      literal CASE), still map-only.
  - topk_per_key:     deterministic per-key reservoir (keep k rows per
                      key, ranked by hash) — one shuffle on the key, the
                      window's sort is partial (rank <= k prune via
                      WindowGroupLimit in Spark >= 3.5).

Unlike `DataFrame.sample` (seeded per-partition RNG: resampling changes
with partitioning), these are stable under repartition, AQE re-planning,
and task retries — the property that matters for dataset reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60

# modulus for hash-rate decisions: h60 % DEN < num  <=>  rate num/DEN
SAMPLE_DEN = 10_000


def _rate_col(key: Column, salt: str) -> Column:
    """Uniform [0, SAMPLE_DEN) bucket from the salted content hash (key
    cast to string so numeric ids hash by their canonical digits)."""
    return h60(F.concat(F.lit(salt), key.cast("string"))) % SAMPLE_DEN


def hash_sample(df: DataFrame, key: str, rate_num: int, salt: str = "s0") -> DataFrame:
    """Keep rows whose salted key-hash bucket < rate_num (p = rate_num/10000)."""
    return df.filter(_rate_col(F.col(key), salt) < rate_num)


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, int],
    default_num: int = 0, salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic rates (num/10000 each).

    `rates` maps stratum value -> rate_num; unlisted strata get
    default_num. The rate table becomes a literal CASE expression — the
    broadcast-dimension pattern without even a broadcast."""
    rate = None
    for val, num in rates.items():
        cond = F.col(stratum) == val
        rate = F.when(cond, num) if rate is None else rate.when(cond, num)
    rate = rate.otherwise(default_num) if rate is not None else F.lit(default_num)
    return df.filter(_rate_col(F.col(key), salt) < rate)


def topk_per_key(
    df: DataFrame, key: str, id_col: str, k: int, salt: str = "s0"
) -> DataFrame:
    """Deterministic fixed-size sample per key: rank rows within each key
    by salted id-hash (ties broken by id) and keep the first k — a
    reproducible 'reservoir' independent of row order and partitioning."""
    w = Window.partitionBy(key).orderBy(
        _rate_col(F.col(id_col), salt).asc(),
        h60(F.concat(F.lit(salt), F.col(id_col))).asc(),
        F.col(id_col).asc(),
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("sample_rank")
    )
