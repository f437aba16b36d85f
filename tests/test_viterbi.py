"""Viterbi map matching (operators/viterbi.py): brute force + plan shape.

The independent anchor enumerates the textbook O(K^2) transition product
per step (min over ALL predecessor candidates of score + penalty *
indicator) with exact Fraction-free integer arithmetic and its own
point-to-segment distance quantization — i.e. it does NOT use the
operator's collapsed best-or-stay recursion, so agreement proves the
collapse is lossless. DEM-style crafted features: a trip that hugs one
segment (stay must win), a trip that crosses between two parallel
segments (switch must pay), and a trip with an uncovered step (must be
excluded entirely).
"""

from __future__ import annotations

from osm_hadoop_spark.operators.viterbi import viterbi_map_match

RADIUS = 50
PENALTY = 30 << 20
STEPS = 4
SCALE = 1 << 20


def _d2q(px, py, ax, ay, bx, by):
    apx, apy = px - ax, py - ay
    abx, aby = bx - ax, by - ay
    dot = apx * abx + apy * aby
    len2 = abx * abx + aby * aby
    if len2 == 0 or dot <= 0:
        return (apx * apx + apy * apy) * SCALE
    if dot >= len2:
        bpx, bpy = px - bx, py - by
        return (bpx * bpx + bpy * bpy) * SCALE
    cr = apx * aby - apy * abx
    return (cr * cr * SCALE) // len2


def _in_radius(px, py, ax, ay, bx, by):
    return _d2q(px, py, ax, ay, bx, by) <= RADIUS * RADIUS * SCALE


def _brute_table(trips, segs):
    """Full K x K DP per trip; returns {(trip, k, seg): score} and only
    includes trips whose every step has a candidate."""
    out = {}
    for trip_id, pts in trips.items():
        cands = []
        for px, py in pts:
            c = {
                s: _d2q(px, py, *g)
                for s, g in segs.items()
                if _in_radius(px, py, *g)
            }
            cands.append(c)
        if any(not c for c in cands):
            continue
        score = dict(cands[0])
        for s, v in score.items():
            out[(trip_id, 1, s)] = v
        for k in range(1, len(pts)):
            nxt = {}
            for s, emis in cands[k].items():
                best = min(
                    pv + (0 if ps == s else PENALTY)
                    for ps, pv in score.items()
                )
                nxt[s] = emis + best
                out[(trip_id, k + 1, s)] = nxt[s]
            score = nxt
    return out


def _dfs(spark, trips, segs):
    pts = spark.createDataFrame(
        [
            (t, k + 1, x, y)
            for t, ps in trips.items()
            for k, (x, y) in enumerate(ps)
        ],
        "trip_id long, k long, x long, y long",
    )
    sg = spark.createDataFrame(
        [(s, *g) for s, g in segs.items()],
        "seg_id long, ax long, ay long, bx long, by long",
    )
    return pts, sg


def _crafted():
    segs = {
        1: (0, 0, 200, 0),      # horizontal road
        2: (0, 40, 200, 40),    # parallel road 40 above
        3: (500, 500, 600, 500),  # far road
    }
    trips = {
        # hugs segment 1: stay all the way
        10: [(10, 2), (60, 1), (110, 3), (160, 0)],
        # starts on 1, ends clearly on 2: one switch must pay
        20: [(20, 1), (70, 5), (120, 38), (170, 41)],
        # step 3 is nowhere near any segment: excluded
        30: [(10, 0), (60, 0), (300, 300), (160, 0)],
    }
    return trips, segs


def test_viterbi_matches_quadratic_brute(spark):
    trips, segs = _crafted()
    # hash-noise trips layered on top of the crafted ones
    import hashlib

    def h(s, m):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m

    for t in range(100, 140):
        x0, y0 = h(f"vx{t}", 180), h(f"vy{t}", 60)
        trips[t] = [
            (x0 + h(f"vdx{t}_{k}", 25), y0 + h(f"vdy{t}_{k}", 25) - 12)
            for k in range(STEPS)
        ]
    pts, sg = _dfs(spark, trips, segs)
    got = {
        (r["trip_id"], r["k"], r["seg_id"]): r["score"]
        for r in viterbi_map_match(pts, sg, RADIUS, PENALTY, STEPS).collect()
    }
    want = _brute_table(trips, segs)
    assert got == want
    assert len(want) > 0
    # crafted trips behaved
    assert all(t != 30 for t, _, _ in got)  # broken chain excluded
    # trip 10 final verdict: best k=4 score is on segment 1, no switches
    fin10 = {s: v for (t, k, s), v in got.items() if t == 10 and k == 4}
    assert min(fin10, key=fin10.get) == 1
    assert fin10[1] < PENALTY  # pure emission, never paid a switch
    # trip 20 final verdict: ends on segment 2 having paid exactly one
    # switch (score >= penalty, < 2 penalties + emissions)
    fin20 = {s: v for (t, k, s), v in got.items() if t == 20 and k == 4}
    assert min(fin20, key=fin20.get) == 2
    # optimal decode is exactly [1, 1, 2, 2]: emissions of that path
    # plus ONE switch penalty
    p20 = [(20, 1), (70, 5), (120, 38), (170, 41)]
    path = [1, 1, 2, 2]
    want20 = PENALTY + sum(
        _d2q(px, py, *segs[s]) for (px, py), s in zip(p20, path)
    )
    assert fin20[2] == want20
    # staying on either single segment the whole way costs more
    for s in (1, 2):
        assert sum(_d2q(px, py, *segs[s]) for px, py in p20) > want20


def test_viterbi_plan_is_jvm_only(spark):
    trips, segs = _crafted()
    pts, sg = _dfs(spark, trips, segs)
    df = viterbi_map_match(pts, sg, RADIUS, PENALTY, STEPS, checkpoint=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
