"""scanline_fill_spans: fill set must equal ray-casting PIP at pixel
centers (independent kernel, functions/spatial.py), including holes,
degenerate thin polygons, and random star-shaped simple polygons."""

import numpy as np
import pytest

from osm_hadoop_spark.operators.polygon_fill import (
    fill_pixel_counts,
    polygon_edges,
    scanline_fill_spans,
)


def _fill_set(spans_rows):
    out = {}
    for r in spans_rows:
        for x in range(r["x_px"], r["x_px"] + r["n_px"]):
            out.setdefault(r["poly_id"], set()).add((x, r["row"]))
    return out


def _pip_set(rings, lo=-64, hi=64):
    """Even-odd membership at pixel centers via the ray-casting kernel."""
    from osm_hadoop_spark.functions.spatial import point_in_polygon_pairs

    gx, gy = np.meshgrid(np.arange(lo, hi), np.arange(lo, hi))
    px = gx.ravel() + 0.5
    py = gy.ravel() + 0.5
    inside = np.zeros(px.shape[0], dtype=bool)
    for xs, ys in rings:
        n = px.shape[0]
        inside ^= point_in_polygon_pairs(
            px, py, np.tile(np.asarray(xs, float), n),
            np.tile(np.asarray(ys, float), n),
            np.full(n, len(xs), dtype=np.int64),
        )
    return {(int(x - 0.5), int(y - 0.5)) for x, y, m in zip(px, py, inside) if m}


def _run(spark, rows):
    df = spark.createDataFrame(rows, "poly_id bigint, xs array<double>, ys array<double>")
    return scanline_fill_spans(df).collect()


def test_square_with_hole(spark):
    rows = [
        (1, [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0]),
        (1, [3.0, 7.0, 7.0, 3.0], [3.0, 3.0, 7.0, 7.0]),
    ]
    got = _fill_set(_run(spark, rows))
    assert got[1] == _pip_set([(r[1], r[2]) for r in rows])
    assert len(got[1]) == 100 - 16


def test_concave_l_shape_two_spans_per_row(spark):
    # L-shape: rows 0..3 full width, rows 4..9 only the left leg
    rows = [(1, [0.0, 10.0, 10.0, 4.0, 4.0, 0.0], [0.0, 0.0, 4.0, 4.0, 10.0, 10.0])]
    spans = _run(spark, rows)
    got = _fill_set(spans)[1]
    assert got == _pip_set([(rows[0][1], rows[0][2])])
    # concavity means some row still yields exactly ONE span (L, not U)
    per_row = {}
    for r in spans:
        per_row[r["row"]] = max(per_row.get(r["row"], 0), r["span"] + 1)
    assert set(per_row.values()) == {1}


def test_u_shape_yields_two_spans(spark):
    rows = [(1, [0.0, 10.0, 10.0, 7.0, 7.0, 3.0, 3.0, 0.0],
             [0.0, 0.0, 10.0, 10.0, 3.0, 3.0, 10.0, 10.0])]
    spans = _run(spark, rows)
    assert _fill_set(spans)[1] == _pip_set([(rows[0][1], rows[0][2])])
    assert max(r["span"] for r in spans) == 1  # some row has 2 spans


def test_thinner_than_a_pixel_row_is_empty(spark):
    rows = [(1, [0.0, 9.0, 9.0, 0.0], [0.1, 0.1, 0.4, 0.4])]
    assert _run(spark, rows) == []


def test_pixel_counts_match_area(spark):
    rows = [(7, [0.0, 8.0, 8.0, 0.0], [0.0, 0.0, 8.0, 8.0])]
    df = spark.createDataFrame(rows, "poly_id bigint, xs array<double>, ys array<double>")
    got = fill_pixel_counts(scanline_fill_spans(df)).collect()
    assert [(r["poly_id"], r["n_interior_px"]) for r in got] == [(7, 64)]


def test_edges_wraparound(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 4.0, 2.0], [0.0, 0.0, 3.0])],
        "poly_id bigint, xs array<double>, ys array<double>",
    )
    got = {(r["x1"], r["y1"], r["x2"], r["y2"]) for r in polygon_edges(df).collect()}
    assert got == {(0.0, 0.0, 4.0, 0.0), (4.0, 0.0, 2.0, 3.0), (2.0, 3.0, 0.0, 0.0)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_star_polygons_match_pip(spark, seed):
    rng = np.random.default_rng(seed)
    rows = []
    rings = {}
    for pid in range(4):
        n = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(2.0, 30.0, n)
        cx, cy = rng.uniform(-20, 20, 2)
        xs = (cx + rad * np.cos(ang)).round(3)  # star-shaped => simple
        ys = (cy + rad * np.sin(ang)).round(3)
        rows.append((pid, [float(v) for v in xs], [float(v) for v in ys]))
        rings[pid] = [(xs, ys)]
    got = _fill_set(_run(spark, rows))
    for pid in rings:
        assert got.get(pid, set()) == _pip_set(rings[pid]), pid
