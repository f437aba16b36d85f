"""Grid polylabel (operators/polylabel.py): exact equality with a
brute-force python twin on a square and a concave L-shape (the even-odd
interior test is load-bearing for the notch)."""

from __future__ import annotations

SCALE = 1 << 20


def _brute(xs, ys):
    n = len(xs)
    xs2 = [x * 2 for x in xs]
    ys2 = [y * 2 for y in ys]
    best = None
    for px in range(min(xs), max(xs) + 1):
        for py in range(min(ys), max(ys) + 1):
            qx, qy = px * 2 + 1, py * 2 + 1
            crossings = 0
            d2q = None
            for i in range(n):
                x1, y1 = xs2[i], ys2[i]
                x2, y2 = xs2[(i + 1) % n], ys2[(i + 1) % n]
                if min(y1, y2) < qy < max(y1, y2):
                    side = (qy - y1) * (x2 - x1) - (qx - x1) * (y2 - y1)
                    if (y2 > y1 and side > 0) or (y2 < y1 and side < 0):
                        crossings += 1
                dot = (qx - x1) * (x2 - x1) + (qy - y1) * (y2 - y1)
                ab2 = (x2 - x1) ** 2 + (y2 - y1) ** 2
                if dot <= 0:
                    d = ((qx - x1) ** 2 + (qy - y1) ** 2) * SCALE
                elif dot >= ab2:
                    d = ((qx - x2) ** 2 + (qy - y2) ** 2) * SCALE
                else:
                    d = ((qx - x1) ** 2 + (qy - y1) ** 2) * SCALE - (
                        dot * dot * SCALE
                    ) // ab2
                d2q = d if d2q is None else min(d2q, d)
            if crossings % 2 == 1:
                key = (-d2q, px, py)
                if best is None or key < best:
                    best = key
    return (best[1], best[2], -best[0])


def _run(spark, polys):
    from osm_hadoop_spark.operators.polylabel import grid_polylabel

    df = spark.createDataFrame(
        polys, "poly_id bigint, xs array<bigint>, ys array<bigint>"
    )
    return {
        r.poly_id: (r.px, r.py, r.d2q) for r in grid_polylabel(df).collect()
    }


def test_polylabel_square_and_lshape(spark):
    square = ([0, 10, 10, 0], [0, 0, 10, 10])
    # L-shape: 20x20 with the upper-right 12x12 notch removed
    lshape = ([0, 20, 20, 8, 8, 0], [0, 0, 8, 8, 20, 20])
    got = _run(spark, [
        (1, list(square[0]), list(square[1])),
        (2, list(lshape[0]), list(lshape[1])),
    ])
    assert got[1] == _brute(*square)
    assert got[2] == _brute(*lshape)
    # square: center block, first by (px, py) tie-break
    assert got[1][:2] == (4, 4)
    # L-shape: the label sits in the fat lower-left corner, not the notch
    px, py, _ = got[2]
    assert not (px > 8 and py > 8)


def test_polylabel_matches_brute_on_triangle(spark):
    tri = ([0, 29, 5], [0, 3, 17])
    got = _run(spark, [(7, list(tri[0]), list(tri[1]))])
    assert got[7] == _brute(*tri)
