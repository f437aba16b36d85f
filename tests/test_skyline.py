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


def _window_nodes(df):
    """All WindowExec nodes of the pre-AQE physical plan, via the JVM tree."""
    out = []

    def rec(node):
        if node.nodeName() == "Window":
            out.append(node)
        for i in range(node.children().size()):
            rec(node.children().apply(i))

    rec(df._jdf.queryExecution().sparkPlan())
    return out


def test_skyline_no_unpartitioned_full_relation_window(spark):
    """Round-5 rewrite pin (round-4 verdict #2): no WindowExec over the
    full point relation may run unpartitioned (single task). The only
    unpartitioned window allowed is the bucket-rollup one, whose input is
    the bucket AGGREGATE relation (a HashAggregate is its descendant)."""
    df = spark.createDataFrame([(1, 2, 3)], "id: long, x: long, y: long")
    sky = pareto_skyline(df)
    wins = _window_nodes(sky)
    assert wins, "expected Window operators in the skyline plan"
    part_count = 0
    for w in wins:
        if w.partitionSpec().size() == 0:
            # bounded-relation exception: must consume the bucket rollup
            assert "HashAggregate" in w.toString(), w.toString()
        else:
            part_count += 1
    assert part_count >= 1  # the full-relation windows are bucket-partitioned
    plan = sky._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
