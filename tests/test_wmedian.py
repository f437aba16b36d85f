"""Weighted median (timeseries.py::weighted_median) vs a brute fold."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _brute(rows):
    by = defaultdict(lambda: defaultdict(int))
    for k, v, w in rows:
        by[k][v] += w
    out = {}
    for k, vw in by.items():
        tot = sum(vw.values())
        run = 0
        for v in sorted(vw):
            run += vw[v]
            if 2 * run >= tot:
                out[k] = (v, tot)
                break
    return out


def _synth():
    return [
        (_h(f"k{i}", 7), _h(f"v{i}", 50), 1 + _h(f"w{i}", 9))
        for i in range(400)
    ]


def test_weighted_median_matches_brute(spark):
    from osm_hadoop_spark.operators.timeseries import weighted_median

    rows = _synth()
    df = spark.createDataFrame(rows, "k long, v long, w long")
    got = {r.k: (r.wmedian, r.total_w)
           for r in weighted_median(df, "k", "v", "w").collect()}
    assert got == _brute(rows)


def test_weighted_median_pinned_cases(spark):
    from osm_hadoop_spark.operators.timeseries import weighted_median

    rows = [
        # one heavy value dominates: median is 10 regardless of order
        (1, 10, 100), (1, 5, 1), (1, 99, 1),
        # exact half split: 2*W(lo) == tot -> LOWER median (the <= rule)
        (2, 1, 5), (2, 2, 5),
        # w=1 everywhere degenerates to the ordinary lower median
        (3, 1, 1), (3, 2, 1), (3, 3, 1), (3, 4, 1),
    ]
    df = spark.createDataFrame(rows, "k long, v long, w long")
    got = {r.k: r.wmedian
           for r in weighted_median(df, "k", "v", "w").collect()}
    assert got == {1: 10, 2: 1, 3: 2}


def test_weighted_median_single_exchange_plan(spark):
    """The pre-agg, both window frames, and the final agg must reuse ONE
    key exchange (partial agg -> exchange -> sort -> windows -> agg)."""
    from osm_hadoop_spark.operators.timeseries import weighted_median

    df = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        (F.col("id") % 17).alias("v"),
        F.lit(1).alias("w"),
    )
    plan = (
        weighted_median(df, "k", "v", "w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in plan
