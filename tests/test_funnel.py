"""Funnel fold (operators/funnel.py) vs an independent Python greedy scan.

Semantics are greedy first-match (the Amplitude/Mixpanel convention).
The brute force re-implements it as explicit per-stage scans over
sorted event lists — a different mechanism from the codegen fold — and
a handcrafted case PINS the deliberate divergence from depth-maximal
chains (a later step-2 event that would have extended the step-3
window does not count).
"""

from __future__ import annotations

import hashlib

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


STEPS = ["view", "click", "purchase"]
W = 1000


def _brute(rows):
    """Greedy first-match by explicit per-stage scans."""
    by_user: dict[int, list] = {}
    for uid, eid, ts, typ in rows:
        if typ in STEPS:
            by_user.setdefault(uid, []).append((ts, eid, STEPS.index(typ) + 1))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        chain = []
        prev = None
        for stage in (1, 2, 3):
            match = None
            for ts, eid, st in evs:
                if st != stage:
                    continue
                if prev is not None:
                    if (ts, eid) <= (prev[0], prev[1]) or ts - prev[0] > W:
                        continue
                match = (ts, eid)
                break
            if match is None:
                break
            chain.append(match)
            prev = match
        flat = [x for m in chain for x in m] + [-1] * (6 - 2 * len(chain))
        out[uid] = (len(chain), *flat)
    return out


def _synth(n):
    rows = []
    types = STEPS + ["noise", "error"]
    for i in range(n):
        uid = _h(f"u{i}", 25)
        rows.append(
            (uid, i, _h(f"ts{i}", 4000), types[_h(f"ty{i}", len(types))])
        )
    # handcrafted: window expiry between steps, simultaneous ts tie,
    # purchase before view (must not count), exact-window boundary,
    # and the pinned greedy-vs-optimal divergence
    rows += [
        (100, 9000, 0, "view"), (100, 9001, 1001, "click"),      # expired
        (101, 9010, 0, "view"), (101, 9011, 0, "click"),          # tie, eid order
        (101, 9012, 5, "purchase"),
        (102, 9020, 50, "purchase"), (102, 9021, 60, "view"),     # wrong order
        (103, 9030, 0, "view"), (103, 9031, 1000, "click"),       # boundary ok
        (103, 9032, 2000, "purchase"),
        # greedy takes click@990 -> purchase@2100 out of window (depth 2),
        # even though click@1200 would have reached depth 3
        (104, 9040, 0, "view"), (104, 9041, 990, "click"),
        (104, 9042, 1200, "click"), (104, 9043, 2100, "purchase"),
    ]
    return rows


def test_funnel_matches_independent_greedy(spark):
    from osm_hadoop_spark.operators.funnel import funnel_steps

    rows = _synth(900)
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    got = {
        r.user_id: (r.depth, r.t1_us, r.e1, r.t2_us, r.e2, r.t3_us, r.e3)
        for r in funnel_steps(df, STEPS, W).collect()
    }
    want = _brute(rows)
    assert got == want
    assert got[100][0] == 1
    assert got[101] == (3, 0, 9010, 0, 9011, 5, 9012)
    assert got[102][0] == 1
    assert got[103][0] == 3
    assert got[104][0] == 2  # the pinned greedy semantics
    assert {v[0] for v in got.values()} >= {1, 2, 3}


def test_funnel_plan_is_single_agg(spark):
    from osm_hadoop_spark.operators.funnel import funnel_steps

    df = spark.createDataFrame(
        [(1, 1, 0, "view")], "user_id long, event_id long, ts_us long, event_type string"
    )
    plan = (
        funnel_steps(df, STEPS, W)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Window" not in plan
    assert "Python" not in plan
    assert plan.count("Exchange") <= 1
