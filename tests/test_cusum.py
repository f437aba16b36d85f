"""CUSUM changepoint (timeseries.py::cusum_changepoint).

Brute force is a literal per-key Python scan over the sorted series
(math.floor cents, prefix loop, argmax with earliest-tie). Crafted
cases: an obvious level shift (cp at the boundary), a symmetric series
forcing an |D| tie (earliest index must win), and single-event keys
(no interior split -> dropped). Plan asserted: one Exchange total —
the window sort and the argmax aggregate share the key partitioning.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from osm_hadoop_spark.operators.timeseries import cusum_changepoint

T0 = datetime(2024, 1, 1)


def _brute(rows):
    by_key = {}
    for k, ts, eid, v in rows:
        by_key.setdefault(k, []).append((ts, eid, v))
    out = {}
    for k, evs in by_key.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        x = [math.floor(v * 100 + 0.5) for _, _, v in evs]
        n = len(x)
        if n < 2:
            continue
        tot, pre, best = sum(x), 0, None
        for i in range(1, n):
            pre += x[i - 1]
            d = abs(n * pre - i * tot)
            if best is None or d > best[1]:
                best = (i, d)
        out[k] = (best[0], best[1], n)
    return out


def _rows():
    rows = []
    # key 1: level shift 10 -> 50 after index 4 (cp_i = 4)
    for i, v in enumerate([10.0, 10.0, 10.0, 10.0, 50.0, 50.0, 50.0]):
        rows.append((1, T0 + timedelta(minutes=i), i, v))
    # key 2: symmetric spike -> |D| ties, earliest index wins
    for i, v in enumerate([0.0, 100.0, 0.0]):
        rows.append((2, T0 + timedelta(minutes=i), 10 + i, v))
    # key 3: single event -> dropped
    rows.append((3, T0, 20, 5.0))
    # key 4: ts tie broken by event_id
    rows.append((4, T0, 31, 1.0))
    rows.append((4, T0, 30, 9.0))
    rows.append((4, T0 + timedelta(minutes=1), 32, 1.0))
    return rows


def test_cusum_matches_brute(spark):
    rows = _rows()
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = {
        r["user_id"]: (r["cp_i"], r["d_abs"], r["n"])
        for r in cusum_changepoint(df).collect()
    }
    want = _brute(rows)
    assert got == want
    assert 3 not in got
    assert got[1][0] == 4  # the level-shift boundary
    # key 2 tie: D_1 = 3*0 - 1*10000, D_2 = 3*10000 - 2*10000 -> equal
    assert got[2] == (1, 10000, 3)


def test_cusum_plan_one_exchange(spark):
    df = spark.createDataFrame(
        _rows(), "user_id long, ts timestamp, event_id long, value double"
    )
    plan = (
        cusum_changepoint(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Python" not in plan
