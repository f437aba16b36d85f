"""Sketch family (operators/sketch.py): bloom join pruning, Misra-Gries
heavy hitters, deterministic HLL registers."""

import math

import pytest
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.sketch import (
    bloom_member,
    bloom_semi_join,
    build_bloom,
    heavy_hitters,
    hll_estimate,
    hll_registers,
    mg_candidates,
)


@pytest.fixture(scope="module")
def kv(spark):
    """200k-row fact side, 1.5k-key dimension subset."""
    big = spark.range(200_000).select(
        (F.col("id") % 10_000).alias("k"), F.col("id").alias("payload")
    )
    keys = spark.range(10_000).where(F.col("id") % 7 == 0).select(
        F.col("id").alias("dim_k")
    )
    return big.cache(), keys.cache()


def test_bloom_exact_vs_semi_join(spark, kv):
    big, keys = kv
    for verify in ("broadcast", "shuffle"):
        got = bloom_semi_join(big, keys, "k", "dim_k", verify=verify)
        exact = big.join(
            keys.withColumnRenamed("dim_k", "k").distinct(), "k", "left_semi"
        )
        assert got.count() == exact.count()
        assert got.exceptAll(exact).count() == 0


def test_bloom_prunes_most_nonmatching(spark, kv):
    """fpr sanity: candidate rows after the bloom test must be close to the
    true matches (8 KiB bloom, 1429 keys, k=3 -> fpr well under 1%)."""
    big, keys = kv
    bloom = build_bloom(keys, "dim_k")
    cand = big.join(F.broadcast(bloom)).where(bloom_member(F.col("k"))).count()
    exact = big.join(
        keys.withColumnRenamed("dim_k", "k").distinct(), "k", "left_semi"
    ).count()
    assert exact <= cand <= exact * 1.01 + 200


def test_bloom_no_false_negatives_by_construction(spark, kv):
    """Every true key must pass its own bloom (probing a key inserted in
    build_bloom can never miss)."""
    _, keys = kv
    bloom = build_bloom(keys, "dim_k")
    misses = (
        keys.join(F.broadcast(bloom))
        .where(~bloom_member(F.col("dim_k")))
        .count()
    )
    assert misses == 0


def test_bloom_shuffle_plan_order(spark, kv):
    """The scale property itself: with verify='shuffle', the exchange that
    feeds the verify join must read the CHECKPOINTED candidate relation
    (bloom applied before the shuffle), not the raw fact scan."""
    big, keys = kv
    out = bloom_semi_join(big, keys, "k", "dim_k", verify="shuffle")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "LeftSemi" in plan
    # the semi join's stream side is the materialized pruned candidates
    assert "Scan ExistingRDD" in plan
    # and the bloom membership test is NOT above the semi join (it ran
    # inside the checkpoint job)
    assert "bloom_words" not in plan


def test_mg_candidates_superset_guarantee(spark):
    """Any item with global count > N/(capacity+1) must appear among the
    MG candidates — checked on a skewed stream split over many tasks."""
    n = 120_000
    cap = 64
    items = spark.range(n).repartition(16).select(
        F.when(F.col("id") % 3 == 0, F.lit("hot1"))
        .when(F.col("id") % 7 == 0, F.lit("hot2"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 40_000).cast("string")))
        .alias("item")
    )
    cands = {r["item"] for r in mg_candidates(items, "item", capacity=cap).collect()}
    exact = {
        r["item"]
        for r in items.groupBy("item").count()
        .where(F.col("count") > n / (cap + 1)).collect()
    }
    assert exact <= cands


def test_heavy_hitters_exact_topk(spark):
    n = 50_000
    items = spark.range(n).repartition(8).select(
        F.concat(F.lit("w"), (F.col("id") % 997).cast("string")).alias("item")
    )
    got = [(r["item"], r["cnt"]) for r in
           heavy_hitters(items, "item", top_k=15, capacity=2048).collect()]
    exact = [(r["item"], r["count"]) for r in
             items.groupBy("item").count()
             .orderBy(F.desc("count"), F.asc("item")).limit(15).collect()]
    assert got == exact
    # exactness precondition: the k-th count clears the MG error bound
    assert exact[-1][1] > n / (2048 + 1)


def test_hll_registers_match_reference_impl(spark):
    """Register table equals a literal Python recompute of the same hash
    (bucket/rho definition pinned independently of the Spark expressions)."""
    import hashlib

    df = spark.range(500).select(
        F.lit("g").alias("g"), (F.col("id") % 300).alias("v")
    )
    got = {
        (r["bucket"], r["max_rho"])
        for r in hll_registers(df, "g", "v", p=8).collect()
    }
    regs: dict[int, int] = {}
    for v in {i % 300 for i in range(500)}:
        h = int(hashlib.md5(f"hll:{v}".encode()).hexdigest()[:15], 16)
        b, rem = h % 256, h >> 8
        rho = 53 if rem == 0 else 53 - rem.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    assert got == set(regs.items())


def test_hll_estimate_accuracy(spark):
    """m=256 registers -> ~6.5% standard error; assert within 20% on a
    20k-distinct stream (far beyond the small-range correction)."""
    df = spark.range(60_000).select(
        F.lit("g").alias("g"), (F.col("id") % 20_000).alias("v")
    )
    pdf = hll_registers(df, "g", "v", p=8).select("bucket", "max_rho").toPandas()
    est = hll_estimate(pdf, p=8)
    assert math.isfinite(est)
    assert abs(est - 20_000) / 20_000 < 0.20


def test_count_min_vs_python_and_guarantee(spark):
    """count_min estimates must equal an independent Python CM build, and
    the one-sided guarantee est >= true must hold for every probe; with
    w smaller than the key space, at least one overestimate must occur
    (collisions are the behavior under test)."""
    import hashlib

    from osm_hadoop_spark.operators.sketch import count_min_estimate

    d, w = 4, 16
    keys = [i % 37 for i in range(500)]  # 37 distinct keys > w columns
    df = spark.createDataFrame([(k,) for k in keys], "uid long")
    probes = spark.createDataFrame([(k,) for k in sorted(set(keys))], "uid long")

    def h60py(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    cells = {}
    for k in keys:
        for r in range(d):
            c = h60py(f"cm{r}_{k}") % w
            cells[(r, c)] = cells.get((r, c), 0) + 1
    true = {str(k): keys.count(k) for k in set(keys)}
    want = {
        str(k): min(cells.get((r, h60py(f"cm{r}_{k}") % w), 0) for r in range(d))
        for k in set(keys)
    }

    out = count_min_estimate(df, probes, "uid", d=d, w=w)
    got = {r["k"]: r["cm_est"] for r in out.collect()}
    assert got == want
    assert all(got[k] >= true[k] for k in got)
    assert any(got[k] > true[k] for k in got)  # collisions really happened

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BroadcastExchange" in plan


def test_hll_merge_equals_direct_sketch(spark):
    """Register merge law: merging fine-group sketches must yield exactly
    the sketch built directly at the coarse group."""
    import pyspark.sql.functions as F

    from osm_hadoop_spark.operators.sketch import hll_merge, hll_registers

    rows = [(i % 40, f"u{i % 97}") for i in range(2000)]
    df = spark.createDataFrame(rows, "fine bigint, user string")
    fine = hll_registers(df, "fine", "user", p=5)
    merged = {
        (r["coarse"], r["bucket"]): r["max_rho"]
        for r in hll_merge(fine, F.expr("fine div 10"), "coarse").collect()
    }
    direct = {
        (r["coarse"], r["bucket"]): r["max_rho"]
        for r in hll_registers(
            df.withColumn("coarse", F.expr("fine div 10")), "coarse", "user",
            p=5,
        ).collect()
    }
    assert merged == direct
    # two-step merge (fine -> mid -> global) equals one-step (associativity)
    mid = hll_merge(fine, F.expr("fine div 5"), "mid")
    two = {
        (r["g"], r["bucket"]): r["max_rho"]
        for r in hll_merge(mid, F.lit(0), "g").collect()
    }
    one = {
        (r["g"], r["bucket"]): r["max_rho"]
        for r in hll_merge(fine, F.lit(0), "g").collect()
    }
    assert two == one
