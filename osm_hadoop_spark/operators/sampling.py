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


def negative_samples(
    documents: DataFrame,
    anchors: DataFrame,
    k: int = 4,
    buckets: int = 64,
    exclude: DataFrame | None = None,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic pseudo-random negative sampling for contrastive
    training: for each anchor, k corpus documents chosen by consistent
    hashing — reproducible across runs, engines, and partitionings
    (unlike `DataFrame.sample`, whose draw depends on partition layout).

    Scheme: every doc owns bucket h60(salt|doc) % B. Probe i of an anchor
    targets bucket h60(salt|anchor|i) % B and takes the doc in that
    bucket minimizing h60(salt|anchor|i|doc) — an independent uniform
    draw per (anchor, probe) from a 1/B slice of the corpus. The anchor
    itself and any (anchor, doc) pair in `exclude` (e.g. the dedup pair
    set — don't use near-duplicates as negatives) are filtered BEFORE the
    argmin, so exclusion never costs a sample unless the whole bucket is
    excluded.

    DataFrame(anchor_id, probe, neg_id) — probe in [0, k); a probe whose
    bucket is empty after exclusion yields no row (caller sees < k rows).

    100 TB posture: candidates are |anchors| * k * (n/B) rows — pick
    B ~ n / c to hold per-probe work at a constant c; the only shuffle is
    the bucket equi-join plus one partial-aggregatable min. No global
    sort, no corpus self-join, no RNG state.
    """
    from osm_hadoop_spark.operators.textstats import h60

    s = F.lit(salt)
    docs_b = documents.select(
        F.col("doc_id").alias("neg_id"),
        (h60(F.concat(s, F.lit("|"), F.col("doc_id").cast("string"))) % buckets)
        .alias("bucket"),
    )
    probes = anchors.select(F.col("doc_id").alias("anchor_id")).select(
        "anchor_id", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("probe")
    ).select(
        "anchor_id",
        "probe",
        (
            h60(
                F.concat(
                    s, F.lit("|"), F.col("anchor_id").cast("string"),
                    F.lit("|"), F.col("probe").cast("string"),
                )
            )
            % buckets
        ).alias("bucket"),
    )
    cand = probes.join(docs_b, "bucket").where(
        F.col("neg_id") != F.col("anchor_id")
    )
    if exclude is not None:
        ex = exclude.select(
            F.col("doc_a").alias("anchor_id"), F.col("doc_b").alias("neg_id")
        ).union(
            exclude.select(
                F.col("doc_b").alias("anchor_id"), F.col("doc_a").alias("neg_id")
            )
        )
        cand = cand.join(ex, ["anchor_id", "neg_id"], "left_anti")
    rank = h60(
        F.concat(
            s, F.lit("|"), F.col("anchor_id").cast("string"),
            F.lit("|"), F.col("probe").cast("string"),
            F.lit("|"), F.col("neg_id").cast("string"),
        )
    )
    return (
        cand.select("anchor_id", "probe", "neg_id", rank.alias("_r"))
        .groupBy("anchor_id", "probe")
        .agg(F.min(F.struct("_r", "neg_id")).alias("_b"))
        .select(
            "anchor_id",
            F.col("probe").cast("bigint").alias("probe"),
            F.col("_b.neg_id").alias("neg_id"),
        )
    )
