"""cost_distance (operators/costdist.py): manhattan baseline, wall
avoidance (cheap-long beats expensive-short), seed intersection, hop
bound, and deterministic tie-break."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.costdist import _PACK, cost_distance


def _cells(spark, rows):
    return spark.createDataFrame([Row(cx=x, cy=y, cost=c) for x, y, c in rows])


def _seeds(spark, pts):
    return spark.createDataFrame([Row(cx=x, cy=y) for x, y in pts])


def test_uniform_grid_is_doubled_manhattan(spark):
    rows = [(x, y, 1) for x in range(4) for y in range(4)]
    out = cost_distance(_cells(spark, rows), _seeds(spark, [(0, 0)]), max_rounds=8)
    got = {(r["cx"], r["cy"]): r["dist2"] for r in out.collect()}
    for x in range(4):
        for y in range(4):
            assert got[(x, y)] == 2 * (x + y)


def test_wall_forces_detour(spark):
    # 5x3 grid, a cost-100 wall down column 2 except the top row:
    # the cheap path from (0,1) to (4,1) climbs to y=2, crosses, and
    # descends — least-cost, not fewest-steps
    rows = []
    for x in range(5):
        for y in range(3):
            c = 100 if (x == 2 and y != 2) else 1
            rows.append((x, y, c))
    out = cost_distance(_cells(spark, rows), _seeds(spark, [(0, 1)]), max_rounds=10)
    got = {(r["cx"], r["cy"]): r["dist2"] for r in out.collect()}
    # detour: (0,1)->(0,2)->(1,2)->(2,2)->(3,2)->(4,2)->(4,1): 6 edges of
    # cost-1 cells = 12; through the wall: (0,1)..(4,1) = 2+101+101+2 = 206
    assert got[(4, 1)] == 12


def test_seed_outside_lattice_ignored_and_hop_bound(spark):
    rows = [(x, 0, 1) for x in range(10)]
    out = cost_distance(
        _cells(spark, rows), _seeds(spark, [(0, 0), (99, 99)]), max_rounds=3
    )
    got = {(r["cx"], r["cy"]): r["dist2"] for r in out.collect()}
    assert set(got) == {(x, 0) for x in range(4)}  # 3 hops from (0,0)
    assert got[(3, 0)] == 6


def test_tie_breaks_to_min_seed_key(spark):
    rows = [(x, 0, 1) for x in range(5)]
    out = cost_distance(
        _cells(spark, rows), _seeds(spark, [(0, 0), (4, 0)]), max_rounds=6
    )
    mid = [r for r in out.collect() if (r["cx"], r["cy"]) == (2, 0)][0]
    assert mid["dist2"] == 4
    assert mid["src_id"] == 0  # packed key of (0,0) < packed key of (4,0)


def test_plan_hygiene(spark):
    rows = [(x, y, 1) for x in range(3) for y in range(3)]
    df = cost_distance(_cells(spark, rows), _seeds(spark, [(0, 0)]), max_rounds=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    assert _PACK == 1 << 20
