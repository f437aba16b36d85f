"""Deterministic sampling operators (operators/sampling.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _docs(spark, n=2000):
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i:05d}" for i in range(n)],
            "stratum": [("a", "b", "c")[i % 3] for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf)


def test_hash_sample_deterministic_under_partitioning(spark):
    from osm_hadoop_spark.operators.sampling import hash_sample

    df = _docs(spark)
    s1 = set(r["doc_id"] for r in hash_sample(df, "doc_id", 2500).collect())
    s2 = set(
        r["doc_id"]
        for r in hash_sample(df.repartition(13, "stratum"), "doc_id", 2500).collect()
    )
    assert s1 == s2  # DataFrame.sample would NOT survive this
    # rate lands near 25% (md5 buckets are uniform; wide tolerance)
    assert 0.20 <= len(s1) / 2000 <= 0.30


def test_stratified_rates_and_salt(spark):
    from osm_hadoop_spark.operators.sampling import stratified_sample

    df = _docs(spark, 3000)
    out = stratified_sample(
        df, "doc_id", "stratum", {"a": 9000, "b": 1000}, default_num=0
    ).groupBy("stratum").count().collect()
    by = {r["stratum"]: r["count"] for r in out}
    assert "c" not in by  # default 0 drops the stratum entirely
    assert by["a"] > 5 * by["b"]  # 9x rate gap, loose bound
    # a different salt reselects
    a1 = set(r["doc_id"] for r in stratified_sample(
        df, "doc_id", "stratum", {"a": 5000}, salt="s0").collect())
    a2 = set(r["doc_id"] for r in stratified_sample(
        df, "doc_id", "stratum", {"a": 5000}, salt="s1").collect())
    assert a1 != a2


def test_topk_per_key_exact_and_stable(spark):
    from osm_hadoop_spark.operators.sampling import topk_per_key

    df = _docs(spark, 999)
    out = topk_per_key(df, "stratum", "doc_id", 10)
    counts = {r["stratum"]: r["count"] for r in out.groupBy("stratum").count().collect()}
    assert counts == {"a": 10, "b": 10, "c": 10}
    # stable under repartition + row-order perturbation
    again = topk_per_key(
        df.repartition(7).sortWithinPartitions(F.desc("doc_id")), "stratum", "doc_id", 10
    )
    assert set(map(tuple, out.collect())) == set(map(tuple, again.collect()))


def test_topk_plan_uses_window_group_limit(spark):
    """rank<=k must prune via WindowGroupLimit (partial top-k per key),
    not a full per-key sort of every row."""
    from osm_hadoop_spark.operators.sampling import topk_per_key

    plan = topk_per_key(_docs(spark), "stratum", "doc_id", 5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_priority_sample_exact_and_size_biased(spark):
    from osm_hadoop_spark.operators.sampling import priority_sample

    rows = [(f"d{i}", "s", 10 if i < 30 else 1000) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, source string, w bigint")
    out = priority_sample(df, key="source", id_col="doc_id",
                          weight_col="w", k=8).collect()
    assert len(out) == 8
    # exact integer priority: recompute one row by hand
    import hashlib
    r = out[0]
    h = int(hashlib.md5(f"p0{r['doc_id']}".encode()).hexdigest()[:15], 16)
    w = 10 if int(r["doc_id"][1:]) < 30 else 1000
    assert r["sample_pri"] == (w * 2**30) // ((h % 2**30) + 1)
    # size bias: the 10 heavy rows (100x weight) should dominate the top-8
    heavy = sum(1 for r in out if int(r["doc_id"][1:]) >= 30)
    assert heavy >= 6


def test_priority_sample_partial_topk_plan(spark):
    from osm_hadoop_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(
        [("a", "s", 5)], "doc_id string, source string, w bigint"
    )
    plan = (
        priority_sample(df, key="source", id_col="doc_id", weight_col="w",
                        k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
