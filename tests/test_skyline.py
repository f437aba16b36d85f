import random

from osm_hadoop_spark.operators.skyline import pareto_skyline


def _brute_skyline(pts):
    """NOT-EXISTS dominance scan — independent of the sort/window plan."""
    out = []
    for i, (ax, ay) in enumerate(pts):
        dominated = any(
            (bx <= ax and by <= ay and (bx < ax or by < ay))
            for j, (bx, by) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((ax, ay))
    return sorted(out)


def _run(spark, pts):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id: long, x: long, y: long"
    )
    return sorted((r["x"], r["y"]) for r in pareto_skyline(df).collect())


def test_skyline_matches_dominance_brute_force(spark):
    rng = random.Random(13)
    pts = [(rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(120)]
    assert _run(spark, pts) == _brute_skyline(pts)


def test_skyline_duplicates_and_ties(spark):
    # duplicate frontier points both survive; same-x worse-y dies;
    # same-y worse-x dies
    pts = [(0, 5), (0, 5), (0, 9), (3, 5), (2, 2), (2, 2), (7, 1)]
    got = _run(spark, pts)
    assert got == _brute_skyline(pts)
    assert got.count((0, 5)) == 2 and got.count((2, 2)) == 2
    assert (0, 9) not in got and (3, 5) not in got


def test_skyline_single_exchange_no_python(spark):
    df = spark.createDataFrame([(1, 2, 3)], "id: long, x: long, y: long")
    plan = pareto_skyline(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one rangepartitioning, nothing else
    assert "Python" not in plan and "Join" not in plan
