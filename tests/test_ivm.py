"""Incremental view maintenance (operators/ivm.py): the delta identity
against a from-scratch aggregate, delete-to-zero group drop, consistency
check, and base-never-read plan."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.ivm import ivm_merge


def _view(spark, rows):
    return (
        spark.createDataFrame([Row(k=k, m=m) for k, m in rows])
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"),
             F.sum("m").cast("bigint").alias("sm"))
    )


def _delta(spark, rows):
    return spark.createDataFrame([Row(k=k, m=m, op=op) for k, m, op in rows])


def test_identity_vs_from_scratch(spark):
    base = [(1, 10), (1, 20), (2, 5), (3, 7)]
    ins = [(1, 30, 1), (4, 9, 1)]
    dels = [(2, 5, -1)]
    merged = ivm_merge(
        _view(spark, base), _delta(spark, ins + dels), "k", "m"
    )
    got = {r["k"]: (r["cnt"], r["sm"]) for r in merged.collect()}
    # from scratch: base - deletes + inserts
    final = [(1, 10), (1, 20), (1, 30), (3, 7), (4, 9)]
    want = {}
    for k, m in final:
        c, s = want.get(k, (0, 0))
        want[k] = (c + 1, s + m)
    assert got == want


def test_delete_to_zero_drops_group(spark):
    merged = ivm_merge(
        _view(spark, [(1, 10)]), _delta(spark, [(1, 10, -1)]), "k", "m",
        check_zero=True,
    )
    assert merged.collect() == []


def test_inconsistent_delta_raises_with_check(spark):
    with pytest.raises(AssertionError, match="residual"):
        ivm_merge(
            _view(spark, [(1, 10)]), _delta(spark, [(1, 99, -1)]), "k", "m",
            check_zero=True,
        ).collect()


def test_base_never_scanned(spark):
    # the merge plan must read the VIEW (already aggregated) and the
    # delta only — no second aggregation over base-sized input exists;
    # proxy: exactly two aggregates (the view build + the delta agg)
    view = _view(spark, [(1, 10), (2, 5)])
    merged = ivm_merge(view, _delta(spark, [(1, 1, 1)]), "k", "m")
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
