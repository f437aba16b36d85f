"""Hilbert range planner (operators/rangeplan.py): state table pinned
against hilbert_key by full enumeration, driver recursion exact-cover
proof, distributed planner == driver planner, and slow-path audit."""

import itertools

from pyspark.sql import functions as F

from osm_hadoop_spark.operators.rangeplan import (
    HILBERT_CHILDREN,
    hilbert_plan_scan,
    hilbert_range_plan,
    hilbert_ranges,
)


def _xy2d(order, x, y):
    """Independent textbook walk (Warren / Hacker's Delight 16-1) —
    the same anchor tests/test_hilbert.py pins hilbert_key against."""
    d = 0
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
    return d


def _d_from_table(order, x, y):
    d, st = 0, 0
    for i in range(order - 1, -1, -1):
        dx, dy = (x >> i) & 1, (y >> i) & 1
        for k, (tx, ty, cs) in enumerate(HILBERT_CHILDREN[st]):
            if (tx, ty) == (dx, dy):
                d += k << (2 * i)
                st = cs
                break
    return d


def test_state_table_reproduces_hilbert_walk():
    # full enumeration at several orders: the quadtree state machine IS
    # the hilbert_key walk, so planner and layout cannot drift
    for order in (1, 2, 3, 5):
        n = 1 << order
        for x in range(n):
            for y in range(n):
                assert _d_from_table(order, x, y) == _xy2d(order, x, y), (
                    order, x, y,
                )


def test_driver_ranges_exact_cover_and_minimal():
    order = 5
    boxes = [
        (0, 31, 0, 31),   # whole grid -> one run
        (0, 0, 0, 0),     # single cell
        (3, 17, 5, 29),   # generic
        (16, 16, 0, 31),  # 1-wide column crossing the midline
        (7, 8, 7, 8),     # 2x2 straddling every level boundary
        (0, 31, 13, 13),  # 1-tall row
    ]
    for x0, x1, y0, y1 in boxes:
        ranges = hilbert_ranges(x0, x1, y0, y1, order)
        covered = set(
            itertools.chain.from_iterable(range(lo, hi + 1) for lo, hi in ranges)
        )
        want = {
            _xy2d(order, x, y)
            for x in range(x0, x1 + 1)
            for y in range(y0, y1 + 1)
        }
        assert covered == want, (x0, x1, y0, y1)
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a1 + 1 < b0, ranges  # sorted, disjoint, gap-separated
    assert hilbert_ranges(0, 31, 0, 31, 5) == [(0, 1023)]


def test_hilbert_runs_fewer_or_equal_intervals_than_zorder():
    # the adjacency payoff: on the same boxes the Hilbert cover needs at
    # most as many scan intervals as the Z cover (strictly fewer on most)
    from osm_hadoop_spark.functions.hilbert import zorder_ranges

    order = 6
    fewer = 0
    for x0, x1, y0, y1 in [(3, 40, 5, 50), (10, 53, 21, 22), (0, 63, 31, 32),
                           (17, 46, 9, 58), (5, 20, 40, 60)]:
        h = len(hilbert_ranges(x0, x1, y0, y1, order))
        z = len(zorder_ranges(x0, x1, y0, y1, order))
        assert h <= z, (x0, x1, y0, y1, h, z)
        fewer += h < z
    assert fewer >= 3


def test_distributed_plan_matches_driver(spark):
    order = 6
    boxes = [
        (0, 0, 63, 0, 63),
        (1, 3, 40, 5, 50),
        (2, 31, 32, 0, 63),
        (3, 7, 8, 7, 8),
        (4, 12, 12, 45, 45),
        (5, 0, 63, 20, 20),
    ]
    df = spark.createDataFrame(boxes, "box_id int, x0 int, x1 int, y0 int, y1 int")
    got = {
        (r.box_id, r.lo, r.hi)
        for r in hilbert_range_plan(df, order).collect()
    }
    want = {
        (bid, lo, hi)
        for bid, x0, x1, y0, y1 in boxes
        for lo, hi in hilbert_ranges(x0, x1, y0, y1, order)
    }
    assert got == want


def test_plan_scan_membership_and_no_python(spark):
    from osm_hadoop_spark.functions.hilbert import hilbert_key

    order = 5
    n = 1 << order
    pts = spark.range(n * n).select(
        F.col("id").alias("pid"),
        (F.col("id") % n).alias("px"),
        (F.col("id") / n).cast("bigint").alias("py"),
    ).withColumn("hkey", hilbert_key(F.col("px"), F.col("py"), order))
    boxes = spark.createDataFrame(
        [(0, 3, 17, 5, 29), (1, 16, 16, 0, 31)],
        "box_id int, x0 int, x1 int, y0 int, y1 int",
    )
    plan = hilbert_range_plan(boxes, order)
    out = hilbert_plan_scan(pts, F.col("hkey"), plan)
    got = {(r.box_id, r.px, r.py) for r in out.collect()}
    want = {
        (bid, x, y)
        for bid, x0, x1, y0, y1 in [(0, 3, 17, 5, 29), (1, 16, 16, 0, 31)]
        for x in range(x0, x1 + 1)
        for y in range(y0, y1 + 1)
    }
    assert got == want
    # planner + scan stay JVM-side end to end
    assert "BatchEvalPython" not in plan._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in out._jdf.queryExecution().executedPlan().toString()
