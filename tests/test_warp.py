"""Affine warp (operators/warp.py): exact equality with a numpy twin,
including negative mapped coordinates (floor-division discipline)."""

from __future__ import annotations


def _twin(src, coeffs, den, bbox):
    a, b, c, d, e, f = coeffs
    x0, x1, y0, y1 = bbox
    out = {}
    for tx in range(x0, x1 + 1):
        for ty in range(y0, y1 + 1):
            sx = (a * tx + b * ty + c) // den  # python // floors
            sy = (d * tx + e * ty + f) // den
            out[(tx, ty)] = src.get((sx, sy), 0)
    return out


def test_affine_warp_matches_twin(spark):
    from osm_hadoop_spark.operators.warp import affine_warp_nearest

    src = {(x, y): 100 * x + y for x in range(-3, 5) for y in range(-2, 6)}
    cells = spark.createDataFrame(
        [(x, y, v) for (x, y), v in src.items()], "cx long, cy long, v long"
    )
    coeffs, den, bbox = (3, -2, -5, 2, 3, -7), 4, (-4, 6, -4, 6)
    got = {
        (r.tx, r.ty): r.v
        for r in affine_warp_nearest(cells, coeffs, den, bbox).collect()
    }
    want = _twin(src, coeffs, den, bbox)
    assert got == want
    # the warp window is fully populated
    assert len(got) == (6 + 4 + 1) ** 2


def test_identity_warp_roundtrip(spark):
    from osm_hadoop_spark.operators.warp import affine_warp_nearest

    src = {(x, y): x * 7 + y for x in range(0, 8) for y in range(0, 8)}
    cells = spark.createDataFrame(
        [(x, y, v) for (x, y), v in src.items()], "cx long, cy long, v long"
    )
    got = {
        (r.tx, r.ty): r.v
        for r in affine_warp_nearest(
            cells, (1, 0, 0, 0, 1, 0), den=1, bbox=(0, 7, 0, 7)
        ).collect()
    }
    assert got == src
