"""SCD2 build (no-op collapse, validity chaining) and island gaps."""

from __future__ import annotations


def test_scd2_collapses_noops_and_chains(spark):
    from osm_hadoop_spark.operators.scd import scd2_build

    # u1: A A B A -> versions A[0,20) B[20,30) A[30,) ; the repeat at t=10
    # is a no-op and must vanish. u2: single change -> one current version.
    rows = [
        (1, 0, 100, "A"), (1, 10, 101, "A"), (1, 20, 102, "B"),
        (1, 30, 103, "A"),
        (2, 5, 200, "X"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, seq long, v string")
    out = sorted(
        (r["k"], r["version"], r["v"], r["valid_from"], r["valid_to"],
         r["is_current"])
        for r in scd2_build(df, "k", "ts", ["v"], "seq").collect()
    )
    assert out == [
        (1, 0, "A", 0, 20, False),
        (1, 1, "B", 20, 30, False),
        (1, 2, "A", 30, None, True),
        (2, 0, "X", 5, None, True),
    ]


def test_scd2_null_safe_attr_compare(spark):
    from osm_hadoop_spark.operators.scd import scd2_build

    rows = [(1, 0, 1, None), (1, 10, 2, None), (1, 20, 3, "A")]
    df = spark.createDataFrame(rows, "k long, ts long, seq long, v string")
    out = scd2_build(df, "k", "ts", ["v"], "seq").collect()
    # NULL -> NULL is a no-op; NULL -> 'A' is a change
    assert sorted((r["version"], r["v"]) for r in out) == [(0, None), (1, "A")]


def test_scd2_single_shuffle_plan(spark):
    """Both windows share (key, ts, seq): exactly one Exchange + one Sort."""
    from osm_hadoop_spark.operators.scd import scd2_build

    df = spark.range(100).selectExpr(
        "id % 5 AS k", "id AS ts", "id AS seq", "CAST(id % 3 AS STRING) AS v"
    )
    plan = (
        scd2_build(df, "k", "ts", ["v"], "seq")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("Sort [") == 1


def test_island_gaps_known(spark):
    from osm_hadoop_spark.operators.islands import island_gaps

    # u1 intervals: [0,10) [5,12) [20,25) [25,30) [40,41)
    # islands: [0,12) [20,30) [40,41) -> gaps [12,20) and [30,40)
    rows = [(1, 1, 0, 10), (1, 2, 5, 12), (1, 3, 20, 25), (1, 4, 25, 30),
            (1, 5, 40, 41), (2, 6, 0, 5)]
    iv = spark.createDataFrame(
        rows, "user_id long, interval_id long, start_us long, end_us long"
    )
    got = sorted(
        (r["user_id"], r["gap_start"], r["gap_end"], r["gap_us"])
        for r in island_gaps(iv).collect()
    )
    assert got == [(1, 12, 20, 8), (1, 30, 40, 10)]
