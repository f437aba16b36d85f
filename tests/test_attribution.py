"""Attribution (operators/attribution.py): hand-pinned window semantics,
strictness boundaries, unattributed bucket, and the one-sort plan."""

import re

from pyspark.sql import Row

from osm_hadoop_spark.operators.attribution import attribute_conversions


def _dfs(spark, touches, convs):
    t = spark.createDataFrame(
        [Row(user_id=u, ts_us=ts, event_id=e, channel=c) for u, ts, e, c in touches]
    )
    c = spark.createDataFrame(
        [Row(user_id=u, ts_us=ts, event_id=e) for u, ts, e in convs]
    )
    return t, c


def test_first_and_last_touch(spark):
    t, c = _dfs(
        spark,
        [(1, 100, 11, "ads"), (1, 200, 12, "email"), (1, 300, 13, "social")],
        [(1, 250, 91), (1, 1000, 92)],
    )
    out = {r["conv_id"]: r for r in attribute_conversions(t, c, lookback=500).collect()}
    # conv 91 at 250 sees touches 100, 200
    assert (out[91]["lt_id"], out[91]["lt_channel"]) == (12, "email")
    assert (out[91]["ft_id"], out[91]["ft_channel"]) == (11, "ads")
    # conv 92 at 1000, lookback 500 -> window (500, 1000): none of 100/200/300
    assert out[92]["lt_id"] is None and out[92]["ft_id"] is None


def test_boundaries_strict(spark):
    # touch exactly at conv ts excluded; touch exactly at t - w excluded
    t, c = _dfs(spark, [(1, 100, 11, "a"), (1, 600, 12, "b")], [(1, 600, 91)])
    out = attribute_conversions(t, c, lookback=500).collect()[0]
    assert out["lt_id"] is None  # 100 <= 600-500 excluded; 600 == conv excluded
    t, c = _dfs(spark, [(1, 101, 11, "a")], [(1, 600, 91)])
    out = attribute_conversions(t, c, lookback=500).collect()[0]
    assert out["lt_id"] == 11  # 101 > 100 — just inside the half-open window


def test_same_ts_tiebreak_and_isolation_across_users(spark):
    t, c = _dfs(
        spark,
        [(1, 100, 11, "a"), (1, 100, 15, "b"), (2, 100, 21, "z")],
        [(1, 200, 91)],
    )
    out = attribute_conversions(t, c, lookback=500).collect()[0]
    assert out["lt_id"] == 15  # same ts: higher seq is "later"
    assert out["ft_id"] == 11
    assert out["lt_channel"] == "b"


def test_single_sort_plan(spark):
    t, c = _dfs(spark, [(1, 100, 11, "a")], [(1, 200, 91)])
    df = attribute_conversions(t, c, lookback=500)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
