"""Point-to-segment snapping (operators/snap.py) vs a Python brute force
that ranks candidates with EXACT rational arithmetic (fractions.Fraction)
quantized the same way — proving the grid candidate join loses no pair
and the fixed-point argmin matches exact math."""

import random
from fractions import Fraction

from pyspark.sql import functions as F


def _brute_snap(points, segments, radius, scale_bits=20):
    scale = 1 << scale_bits
    out = {}
    for pid, x, y in points:
        best = None
        for sid, ax, ay, bx, by in segments:
            apx, apy = x - ax, y - ay
            abx, aby = bx - ax, by - ay
            dot = apx * abx + apy * aby
            len2 = abx * abx + aby * aby
            if dot <= 0:
                d2 = Fraction(apx * apx + apy * apy)
            elif dot >= len2:
                d2 = Fraction((x - bx) ** 2 + (y - by) ** 2)
            else:
                cross = apx * aby - apy * abx
                d2 = Fraction(cross * cross, len2)
            if d2 > radius * radius:
                continue
            d2q = (d2 * scale).__floor__()
            if best is None or (d2q, sid) < best:
                best = (d2q, sid)
        if best is not None:
            out[pid] = (best[1], best[0])
    return out


def test_snap_matches_exact_rational_brute_force(spark):
    from osm_hadoop_spark.operators.snap import snap_points

    rng = random.Random(11)
    points = [(i, rng.randrange(400), rng.randrange(400)) for i in range(250)]
    segments = []
    for s in range(120):
        ax, ay = rng.randrange(400), rng.randrange(400)
        segments.append(
            (s, ax, ay, ax + rng.randrange(-60, 61), ay + rng.randrange(-60, 61))
        )
    # include a degenerate zero-length segment (a == b)
    segments.append((120, 200, 200, 200, 200))

    p_df = spark.createDataFrame(points, "point_id: long, x: long, y: long")
    s_df = spark.createDataFrame(
        segments, "seg_id: long, ax: long, ay: long, bx: long, by: long"
    )
    got = {
        r["point_id"]: (r["seg_id"], r["d2q"])
        for r in snap_points(p_df, s_df, radius=30).collect()
    }
    assert got == _brute_snap(points, segments, 30)


def test_snap_radius_boundary_inclusive(spark):
    from osm_hadoop_spark.operators.snap import snap_points

    # point exactly radius away from the segment interior: kept (<=)
    p_df = spark.createDataFrame([(1, 50, 10)], "point_id: long, x: long, y: long")
    s_df = spark.createDataFrame(
        [(7, 0, 0, 100, 0)], "seg_id: long, ax: long, ay: long, bx: long, by: long"
    )
    rows = snap_points(p_df, s_df, radius=10).collect()
    assert len(rows) == 1 and rows[0]["d2q"] == 100 << 20
    # one unit beyond: dropped
    p2 = spark.createDataFrame([(1, 50, 11)], "point_id: long, x: long, y: long")
    assert snap_points(p2, s_df, radius=10).count() == 0


def test_snap_candidates_never_duplicate(spark):
    from osm_hadoop_spark.operators.snap import snap_points

    # a long segment covering many cells around a single point must still
    # contribute exactly one candidate row (point has ONE home cell)
    from osm_hadoop_spark.operators import snap as snap_mod

    p_df = spark.createDataFrame([(1, 55, 5)], "point_id: long, x: long, y: long")
    s_df = spark.createDataFrame(
        [(3, 0, 0, 90, 0)], "seg_id: long, ax: long, ay: long, bx: long, by: long"
    )
    cell = 10
    seg_cells = s_df.select(
        "seg_id",
        F.explode(snap_mod._cells_1d(F.least("ax", "bx") - 10, F.greatest("ax", "bx") + 10, cell)).alias("cx"),
    )
    assert seg_cells.count() > 5  # really multi-cell
    out = snap_points(p_df, s_df, radius=10, cell_size=cell).collect()
    assert len(out) == 1 and out[0]["seg_id"] == 3
