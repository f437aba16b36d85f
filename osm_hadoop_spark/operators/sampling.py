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


def priority_sample(
    df: DataFrame, key: str, id_col: str, weight_col: str, k: int,
    salt: str = "p0", res_bits: int = 30,
) -> DataFrame:
    """Deterministic weighted top-k sampling per key — priority sampling
    (Duffield, Lund & Thorup, JACM 2007): each row gets priority w/u for
    u ~ Uniform(0,1]; the k highest priorities form a sample whose
    Horvitz-Thompson estimates are near-optimal for subset-sum queries.
    The size-biased cousin of `topk_per_key` (heavy rows are
    proportionally more likely to survive) — the right sampler for
    quality-weighted or length-weighted corpus subsampling.

    Determinism + exactness: u comes from the low res_bits of the salted
    content hash (u ≈ (h'+1)/2^res_bits with h' = h mod 2^res_bits), and
    the priority is the exact integer
        pri = floor(w · 2^res_bits / (h' + 1))
    — integer division, bit-identical in Spark and DuckDB, no float pow
    anywhere. res_bits trades u-resolution against headroom: the product
    w · 2^30 needs w < 2^33. Ties (same pri) break by id for a total
    order.

    Plan: identical to topk_per_key — one shuffle on the key, partial
    top-k via WindowGroupLimit (rank <= k prunes inside the sort).
    """
    # exact integer division (not float division-then-cast): use `div`
    pri = F.expr(
        f"(CAST({weight_col} AS BIGINT) * CAST({2**res_bits} AS BIGINT)) "
        f"div ((CAST(conv(substring(md5(concat('{salt}', "
        f"CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT) "
        f"% {2**res_bits}) + 1)"
    )
    w = Window.partitionBy(key).orderBy(
        F.col("sample_pri").desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_pri", pri)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("sample_rank")
    )
