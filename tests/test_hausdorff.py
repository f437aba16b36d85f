import random

from pyspark.sql import functions as F

from osm_hadoop_spark.functions.geodesic import directed_hausdorff2


def _brute_h2(ps, qs):
    return max(
        min((px - qx) ** 2 + (py - qy) ** 2 for qx, qy in qs) for px, py in ps
    )


def _run(spark, rows):
    df = spark.createDataFrame(
        rows,
        "i: long, xs: array<double>, ys: array<double>, "
        "qxs: array<double>, qys: array<double>",
    )
    out = df.select("i", directed_hausdorff2("xs", "ys", "qxs", "qys").alias("h2"))
    return {r["i"]: r["h2"] for r in out.collect()}


def test_hausdorff_matches_brute_force(spark):
    rng = random.Random(11)
    rows, truth = [], {}
    for i in range(15):
        ps = [(float(rng.randrange(-40, 40)), float(rng.randrange(-40, 40)))
              for _ in range(rng.randrange(1, 12))]
        qs = [(float(rng.randrange(-40, 40)), float(rng.randrange(-40, 40)))
              for _ in range(rng.randrange(1, 12))]
        rows.append((i, [p[0] for p in ps], [p[1] for p in ps],
                     [q[0] for q in qs], [q[1] for q in qs]))
        truth[i] = _brute_h2(ps, qs)
    assert _run(spark, rows) == truth


def test_hausdorff_directed_properties(spark):
    # subset direction is 0; the reverse direction measures the gap —
    # and the metric is NOT symmetric
    ps = [(0.0, 0.0), (10.0, 0.0), (5.0, 7.0)]
    sub = ps[:2]
    rows = [
        (0, [p[0] for p in sub], [p[1] for p in sub],
            [p[0] for p in ps], [p[1] for p in ps]),
        (1, [p[0] for p in ps], [p[1] for p in ps],
            [p[0] for p in sub], [p[1] for p in sub]),
    ]
    got = _run(spark, rows)
    assert got[0] == 0.0
    assert got[1] == _brute_h2(ps, sub) == 25.0 + 49.0


def test_hausdorff_stays_jvm(spark):
    # the whole metric must be a single projection: no exchange, no
    # Python evaluation node in the plan
    df = spark.createDataFrame(
        [(1, [0.0], [0.0], [1.0], [1.0])],
        "i: long, xs: array<double>, ys: array<double>, "
        "qxs: array<double>, qys: array<double>",
    )
    plan = (
        df.select(directed_hausdorff2("xs", "ys", "qxs", "qys").alias("h2"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
