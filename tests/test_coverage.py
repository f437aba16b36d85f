"""Exact polygon∩tile coverage (functions/coverage.py).

Three independent layers of proof:

1. the clamped-Green 5-band closed form equals a Sutherland-Hodgman box
   clip + shoelace, in exact Fractions, over random rings (the MATH);
2. the Spark rendering and the DuckDB rendering of the one DSL ladder
   both reproduce an independent per-edge-floor Python reference (the
   ENGINES);
3. summing exact per-cell coverages over the bbox recovers the ring's
   total shoelace area (a GLOBAL identity none of the pieces assumes).

Plus the plan-shape guard: explode + codegen map + one hash aggregate,
no join, no Python.
"""

import math
import random
from fractions import Fraction as Fr

CELL, SCALE = 256, 128


# ---------------------------------------------------------------------------
# independent references (pure Python, exact rationals)
# ---------------------------------------------------------------------------


def _sh_clip_area2(pts, xl, yb, xr, yt):
    """2 * signed area of polygon ∩ box via Sutherland-Hodgman, Fractions."""

    def clip(poly, inside, inter):
        out = []
        for i in range(len(poly)):
            a, b = poly[i], poly[(i + 1) % len(poly)]
            if inside(a):
                out.append(a)
                if not inside(b):
                    out.append(inter(a, b))
            elif inside(b):
                out.append(inter(a, b))
        return out

    def x_at(a, b, x):
        return (a[0] + (b[0] - a[0]) * (Fr(x) - a[1]) / (b[1] - a[1]), Fr(x))

    def y_at(a, b, y):
        return (Fr(y), a[1] + (b[1] - a[1]) * (Fr(y) - a[0]) / (b[0] - a[0]))

    P = [(Fr(x), Fr(y)) for x, y in pts]
    for ins, itr in [
        (lambda p: p[0] >= xl, lambda a, b: y_at(a, b, xl)),
        (lambda p: p[0] <= xr, lambda a, b: y_at(a, b, xr)),
        (lambda p: p[1] >= yb, lambda a, b: x_at(a, b, yb)),
        (lambda p: p[1] <= yt, lambda a, b: x_at(a, b, yt)),
    ]:
        P = clip(P, ins, itr)
        if not P:
            return Fr(0)
    return sum(
        P[i][0] * P[(i + 1) % len(P)][1] - P[(i + 1) % len(P)][0] * P[i][1]
        for i in range(len(P))
    )


def _edge_contrib(ax, ay, bx, byy, xl, yb, xr, yt):
    """The 5-band form re-derived independently (branchy scalar code, vs
    the DSL's branch-free interval ladder). Returns an exact Fraction."""
    dx, dy = bx - ax, byy - ay
    adx, ady = max(abs(dx), 1), max(abs(dy), 1)
    dd = adx * ady
    pos, neg = dd + 1, -1
    sxl = (xl - ax) * ady if dx > 0 else (ax - xl) * ady
    sxr = (xr - ax) * ady if dx > 0 else (ax - xr) * ady
    syb = (yb - ay) * adx if dy > 0 else (ay - yb) * adx
    syt = (yt - ay) * adx if dy > 0 else (ay - yt) * adx
    full, empty = (neg, pos), (pos, neg)
    if dx != 0:
        xm = (min(sxl, sxr), max(sxl, sxr))
        xle = (neg, sxl) if dx > 0 else (sxl, pos)
        xri = (sxr, pos) if dx > 0 else (neg, sxr)
    else:
        xm = full if xl <= ax <= xr else empty
        xle = full if ax < xl else empty
        xri = full if ax > xr else empty
    if dy != 0:
        ym = (min(syb, syt), max(syb, syt))
        ybo = (neg, syb) if dy > 0 else (syb, pos)
        yto = (syt, pos) if dy > 0 else (neg, syt)
    else:
        ym = full if yb <= ay <= yt else empty
        ybo = full if ay < yb else empty
        yto = full if ay > yt else empty

    def plen(xb, ybd):
        return max(min(xb[1], ybd[1], dd) - max(xb[0], ybd[0], 0), 0)

    kk = ax * dy - ay * dx
    nn = (
        plen(xm, ym) * kk
        + xl * dy * plen(xle, ym)
        + xr * dy * plen(xri, ym)
        - yb * dx * plen(xm, ybo)
        - yt * dx * plen(xm, yto)
    )
    return Fr(nn, dd)


def _ref_coverage(pts, cell=CELL, scale=SCALE):
    """Per-cell fixed-point coverage: sum of per-edge floors."""
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    out = {}
    for tx in range(math.floor(min(xs) / cell), math.floor(max(xs) / cell) + 1):
        for ty in range(math.floor(min(ys) / cell), math.floor(max(ys) / cell) + 1):
            tot = 0
            for i in range(len(pts)):
                fr = _edge_contrib(
                    *pts[i], *pts[(i + 1) % len(pts)],
                    tx * cell, ty * cell, tx * cell + cell, ty * cell + cell,
                )
                tot += (scale * fr.numerator) // fr.denominator
            out[(tx, ty)] = tot
    return out


def _rings(seed, n, span=800):
    rng = random.Random(seed)
    out = []
    for wid in range(n):
        k = rng.choice([3, 3, 4, 5, 6])
        out.append(
            (wid, [(rng.randint(-span, span), rng.randint(-span, span))
                   for _ in range(k)])
        )
    return out


# ---------------------------------------------------------------------------
# 1. the math: closed form == Sutherland-Hodgman, exactly
# ---------------------------------------------------------------------------


def test_clamped_green_equals_sh_clip():
    rng = random.Random(23)
    for _ in range(400):
        k = rng.choice([3, 3, 4, 5, 7])
        pts = [(rng.randint(-800, 800), rng.randint(-800, 800)) for _ in range(k)]
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        tx = rng.randint(min(xs) // CELL - 1, max(xs) // CELL + 1)
        ty = rng.randint(min(ys) // CELL - 1, max(ys) // CELL + 1)
        xl, yb = tx * CELL, ty * CELL
        want = _sh_clip_area2(pts, xl, yb, xl + CELL, yb + CELL)
        got = sum(
            _edge_contrib(*pts[i], *pts[(i + 1) % k], xl, yb, xl + CELL, yb + CELL)
            for i in range(k)
        )
        assert got == want, (pts, tx, ty)


def test_bbox_cells_sum_to_total_area():
    # global identity: cell coverages tile the ring exactly
    for wid, pts in _rings(31, 30):
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        total = Fr(0)
        for tx in range(math.floor(min(xs) / CELL), math.floor(max(xs) / CELL) + 1):
            for ty in range(math.floor(min(ys) / CELL), math.floor(max(ys) / CELL) + 1):
                total += sum(
                    _edge_contrib(
                        *pts[i], *pts[(i + 1) % len(pts)],
                        tx * CELL, ty * CELL, tx * CELL + CELL, ty * CELL + CELL,
                    )
                    for i in range(len(pts))
                )
        shoelace2 = sum(
            pts[i][0] * pts[(i + 1) % len(pts)][1]
            - pts[(i + 1) % len(pts)][0] * pts[i][1]
            for i in range(len(pts))
        )
        assert total == shoelace2, (wid, pts)


def test_fixed_point_error_bound():
    for wid, pts in _rings(37, 20):
        fp = _ref_coverage(pts)
        for (tx, ty), v in fp.items():
            exact = _sh_clip_area2(
                pts, tx * CELL, ty * CELL, tx * CELL + CELL, ty * CELL + CELL
            )
            assert abs(Fr(v) - exact * SCALE) < len(pts), (wid, tx, ty)


# ---------------------------------------------------------------------------
# 2. the engines: both renderings reproduce the reference
# ---------------------------------------------------------------------------


def _spark_cov(spark, rings, cell=CELL, scale=SCALE, **kw):
    from osm_hadoop_spark.functions.coverage import tile_coverage

    df = spark.createDataFrame(
        [(wid, [p[0] for p in pts], [p[1] for p in pts]) for wid, pts in rings],
        "way_id long, xs array<long>, ys array<long>",
    )
    return {
        (r.way_id, r.tx, r.ty): r.cov2s
        for r in tile_coverage(df, cell, scale, **kw).collect()
    }


def test_spark_matches_reference(spark):
    rings = _rings(41, 40)
    want = {
        (wid,) + ck: v
        for wid, pts in rings
        for ck, v in _ref_coverage(pts).items()
    }
    assert _spark_cov(spark, rings) == want


def test_duckdb_render_matches_reference(spark):
    import duckdb

    from osm_hadoop_spark.functions.coverage import coverage_sql

    rings = _rings(43, 25)
    rows = []
    for wid, pts in rings:
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        for i in range(len(pts)):
            ax, ay = pts[i]
            bx, byy = pts[(i + 1) % len(pts)]
            for tx in range(
                math.floor(min(xs) / CELL), math.floor(max(xs) / CELL) + 1
            ):
                for ty in range(
                    math.floor(min(ys) / CELL), math.floor(max(ys) / CELL) + 1
                ):
                    rows.append((wid, ax, ay, bx, byy, tx, ty))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE cand(way_id BIGINT, ax BIGINT, ay BIGINT,"
        " bx BIGINT, byy BIGINT, tx BIGINT, ty BIGINT)"
    )
    con.executemany("INSERT INTO cand VALUES (?,?,?,?,?,?,?)", rows)
    got = {
        (r[0], r[1], r[2]): r[3]
        for r in con.execute(
            "SELECT way_id, tx, ty, CAST(SUM(cov_fp) AS BIGINT) FROM "
            + coverage_sql("SELECT * FROM cand", CELL, SCALE)
            + " GROUP BY 1,2,3"
        ).fetchall()
    }
    want = {
        (wid,) + ck: v
        for wid, pts in rings
        for ck, v in _ref_coverage(pts).items()
    }
    assert got == want


def test_orientation_sign_and_guards(spark):
    sq = [(0, 0), (512, 0), (512, 512), (0, 512)]  # CCW, covers 4 cells
    got = _spark_cov(spark, [(1, sq), (2, list(reversed(sq)))])
    full = 2 * CELL * CELL * SCALE
    for tx in (0, 1):
        for ty in (0, 1):
            assert got[(1, tx, ty)] == full
            assert got[(2, tx, ty)] == -full
    # max_cells guard drops the blown-up ring, keeps the sane one
    wide = [(0, 0), (CELL * 100, 0), (CELL * 100, CELL * 100)]
    got = _spark_cov(spark, [(1, sq), (3, wide)], max_cells=16)
    assert {w for (w, _, _) in got} == {1}


# ---------------------------------------------------------------------------
# 3. plan shape: explode + codegen map + ONE aggregate exchange
# ---------------------------------------------------------------------------


def test_plan_shape(spark):
    from osm_hadoop_spark.functions.coverage import tile_coverage

    df = spark.createDataFrame(
        [(1, [0, 512, 512], [0, 0, 512])],
        "way_id long, xs array<long>, ys array<long>",
    )
    plan = (
        tile_coverage(df, CELL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Join" not in plan
    assert plan.count("Exchange") == 1  # the final hash aggregate only


# ---------------------------------------------------------------------------
# areal interpolation on top of the kernel
# ---------------------------------------------------------------------------


def _ref_alloc(pts, total, cell=CELL, scale=SCALE):
    cov = _ref_coverage(pts, cell, scale)
    tot2 = sum(cov.values())
    canon = {k: max(-v if tot2 < 0 else v, 0) for k, v in cov.items()}
    den = sum(canon.values())
    if den <= 0:
        return {}
    return {k: (total * c) // den for k, c in canon.items()}


def test_areal_interpolation_matches_reference(spark):
    from osm_hadoop_spark.functions.coverage import areal_interpolate

    rings = _rings(47, 30)
    rng = random.Random(53)
    totals = {wid: rng.randint(1, 100000) for wid, _ in rings}
    df = spark.createDataFrame(
        [
            (wid, totals[wid], [p[0] for p in pts], [p[1] for p in pts])
            for wid, pts in rings
        ],
        "way_id long, total_v long, xs array<long>, ys array<long>",
    )
    got = {
        (r.way_id, r.tx, r.ty): r.alloc
        for r in areal_interpolate(df, "total_v", CELL, SCALE).collect()
    }
    want = {
        (wid,) + k: v
        for wid, pts in rings
        for k, v in _ref_alloc(pts, totals[wid]).items()
    }
    assert got == want
    # conservation: floored shares never exceed the total, lose < n_cells
    for wid, pts in rings:
        alloc = [v for (w, _, _), v in got.items() if w == wid]
        if alloc:
            assert 0 <= totals[wid] - sum(alloc) < len(alloc)


def test_areal_orientation_invariance(spark):
    from osm_hadoop_spark.functions.coverage import areal_interpolate

    tri = [(10, 10), (500, 40), (200, 480)]
    df = spark.createDataFrame(
        [
            (1, 1000, [p[0] for p in tri], [p[1] for p in tri]),
            (2, 1000, [p[0] for p in reversed(tri)], [p[1] for p in reversed(tri)]),
        ],
        "way_id long, total_v long, xs array<long>, ys array<long>",
    )
    got = {}
    for r in areal_interpolate(df, "total_v", CELL, SCALE).collect():
        got.setdefault(r.way_id, {})[(r.tx, r.ty)] = r.alloc
    assert got[1] == got[2]


def test_areal_single_exchange(spark):
    from osm_hadoop_spark.functions.coverage import areal_interpolate

    df = spark.createDataFrame(
        [(1, 7, [0, 512, 512], [0, 0, 512])],
        "way_id long, total_v long, xs array<long>, ys array<long>",
    )
    plan = (
        areal_interpolate(df, "total_v", CELL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Join" not in plan
    # the explicit repartition(way_id) is reused by the aggregate AND both
    # way_id windows — one Exchange end to end
    assert plan.count("Exchange") == 1
