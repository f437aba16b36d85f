"""Pair confusion census (operators/linkage.py): brute all-pairs
replay, perfect/degenerate clusterings, and total-pairs identity."""

import random

from osm_hadoop_spark.operators.linkage import pair_confusion


def _brute(assign):
    items = list(assign)
    tp = fp = fn = tn = 0
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            p = assign[items[i]][0] == assign[items[j]][0]
            t = assign[items[i]][1] == assign[items[j]][1]
            tp += p and t
            fp += p and not t
            fn += t and not p
            tn += (not p) and (not t)
    return tp, fp, fn, tn


def _run(spark, assign):
    rows = [(k, p, t) for k, (p, t) in assign.items()]
    df = spark.createDataFrame(rows, "item long, pred long, truth long")
    r = pair_confusion(df).collect()[0]
    return r


def test_matches_brute(spark):
    rng = random.Random(19)
    assign = {
        i: (rng.randint(0, 6), rng.randint(0, 4)) for i in range(200)
    }
    r = _run(spark, assign)
    assert (r.tp, r.fp, r.fn, r.tn) == _brute(assign)
    assert r.n_items == 200
    n2 = 200 * 199 // 2
    assert r.tp + r.fp + r.fn + r.tn == n2


def test_perfect_and_orthogonal(spark):
    # identical clusterings: fp = fn = 0
    perfect = {i: (i % 3, i % 3) for i in range(30)}
    r = _run(spark, perfect)
    assert r.fp == 0 and r.fn == 0 and r.tp > 0
    # singletons vs one blob: tp = 0, tn = 0
    ortho = {i: (i, 0) for i in range(10)}
    r2 = _run(spark, ortho)
    assert r2.tp == 0 and r2.fp == 0 and r2.tn == 0
    assert r2.fn == 10 * 9 // 2
