"""Rolling active users (timeseries.py::rolling_active_users) vs brute."""

from __future__ import annotations

import hashlib
from collections import defaultdict


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _brute(rows, w):
    byday = defaultdict(set)
    for u, d in rows:
        byday[d].add(u)
    days = sorted(byday)
    out = {}
    for d in days:
        win = set()
        for k in range(w):
            win |= byday.get(d - k, set())
        out[d] = (len(byday[d]), len(win))
    return out


def _synth():
    rows = [(_h(f"u{i}", 30), _h(f"d{i}", 25)) for i in range(500)]
    # gap: nobody active on days 40-46; day 47 has one user — its WAU
    # window must NOT see day 39 activity beyond the 7-day horizon
    rows += [(999, 39), (998, 47)]
    return rows


def test_wau_matches_brute(spark):
    from osm_hadoop_spark.operators.timeseries import rolling_active_users

    rows = _synth()
    df = spark.createDataFrame(rows, "user_id long, day long")
    got = {r.day: (r.dau, r.wau)
           for r in rolling_active_users(df, window_days=7).collect()}
    assert got == _brute(rows, 7)
    assert got[47] == (1, 1)          # horizon: day 39 is 8 days back
    assert 40 not in got               # no-event days are not reported


def test_wau_window_1_degenerates_to_dau(spark):
    from osm_hadoop_spark.operators.timeseries import rolling_active_users

    rows = [(1, 10), (2, 10), (1, 11), (1, 10)]
    df = spark.createDataFrame(rows, "user_id long, day long")
    got = {r.day: (r.dau, r.wau)
           for r in rolling_active_users(df, window_days=1).collect()}
    assert got == {10: (2, 2), 11: (1, 1)}
