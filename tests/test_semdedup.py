"""SemDeDup (operators/semdedup.py): planted-duplicate recall, keep-one
semantics, layout invariance, neighborhood guard, and plan hygiene."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.semdedup import (
    semdedup_fit_centroids,
    semdedup_prune,
)


def _vec(seed, dim=8, lo=-100, hi=100):
    rng = np.random.RandomState(seed)
    return (rng.randint(lo, hi, dim) / 128.0).tolist()


@pytest.fixture(scope="module")
def corpus(spark):
    # two planted duplicate groups (ids 1,2,3 identical; 10,11 near-
    # identical) in a background of well-separated vectors
    base = _vec(1)
    near = [x + 0.001 for x in _vec(10)]
    rows = [
        Row(vec_id=1, embedding=base),
        Row(vec_id=2, embedding=base),
        Row(vec_id=3, embedding=base),
        Row(vec_id=10, embedding=_vec(10)),
        Row(vec_id=11, embedding=near),
    ] + [Row(vec_id=100 + i, embedding=_vec(1000 + i)) for i in range(40)]
    return spark.createDataFrame(rows)


def _run(corpus, **kw):
    cents = semdedup_fit_centroids(corpus, k=4, iters=3, sample=1000)
    return semdedup_prune(corpus, cents, tau_num=9, tau_den=10, **kw)


def test_planted_groups_keep_one(corpus):
    out = {r["vec_id"]: r for r in _run(corpus).collect()}
    # identical triple: min id kept, others point at it
    assert out[1]["kept"] and out[1]["dup_of"] is None
    assert not out[2]["kept"] and out[2]["dup_of"] == 1
    assert not out[3]["kept"] and out[3]["dup_of"] == 1
    # near-identical pair
    assert out[10]["kept"]
    assert not out[11]["kept"] and out[11]["dup_of"] == 10
    # every input row is present exactly once
    assert len(out) == 45


def test_background_untouched(corpus):
    out = _run(corpus).filter(F.col("vec_id") >= 100)
    assert out.filter(~F.col("kept")).count() == 0


def test_layout_invariance(corpus):
    a = sorted(map(tuple, _run(corpus).collect()))
    b = sorted(map(tuple, _run(corpus.repartition(7, "embedding")).collect()))
    assert a == b


def test_neighborhood_guard_finds_planted(corpus):
    # identical vectors have identical centroid dots -> adjacent in the
    # (cdot, id) order, so the linear sorted-neighborhood path keeps the
    # planted groups' recall
    out = {r["vec_id"]: r for r in _run(corpus, neighborhood=3).collect()}
    assert not out[2]["kept"] and out[2]["dup_of"] == 1
    assert not out[3]["kept"] and out[3]["dup_of"] == 1
    assert not out[11]["kept"] and out[11]["dup_of"] == 10
    assert len(out) == 45


def test_neighborhood_candidates_linear(corpus):
    # exact mode within one cluster of size c tests c(c-1)/2 pairs; the
    # w=2 neighborhood tests exactly c-1 — assert the guard can only
    # *reduce* the pruned set, never invent a witness outside tau
    exact = {r["vec_id"] for r in _run(corpus).filter(~F.col("kept")).collect()}
    capped = {
        r["vec_id"]
        for r in _run(corpus, neighborhood=2).filter(~F.col("kept")).collect()
    }
    assert capped <= exact


def test_plan_hygiene(corpus):
    plan = _run(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
