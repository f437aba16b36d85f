"""Trip segmentation (operators/trajectory.py) vs a sequential brute force."""

from __future__ import annotations

import hashlib

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _synth_pings(n_entities: int, n_pings: int):
    """Deterministic random-walk pings with teleports, duplicate
    timestamps (tiebreak coverage), and hour-scale gaps."""
    rows = []
    for e in range(n_entities):
        t, x, y = 0, 0, 0
        for i in range(n_pings):
            pid = e * n_pings + i
            t += _h(f"dt{pid}", 7200) * 1_000_000  # 0..2h in micros
            if _h(f"tie{pid}", 5) == 0 and i > 0:
                t = rows[-1][2]  # duplicate timestamp -> tiebreak on id
            if _h(f"tp{pid}", 12) == 0:
                x += _h(f"jx{pid}", 2001) - 1000
                y += _h(f"jy{pid}", 2001) - 1000
            else:
                x += _h(f"sx{pid}", 21) - 10
                y += _h(f"sy{pid}", 21) - 10
            rows.append((e, pid, t, x, y))
    return rows


def _brute_trips(rows, gap_us, jump):
    trips = {}
    by_e = {}
    for (e, pid, t, x, y) in rows:
        by_e.setdefault(e, []).append((t, pid, x, y))
    for e, pings in by_e.items():
        pings.sort()
        trip = -1
        prev = None
        for (t, pid, x, y) in pings:
            brk = (
                prev is None
                or t - prev[0] > gap_us
                or (x - prev[2]) ** 2 + (y - prev[3]) ** 2 > jump * jump
            )
            if brk:
                trip += 1
            key = (e, trip)
            n, lo, hi, ml = trips.get(key, (0, t, t, 0))
            move = 0 if brk else abs(x - prev[2]) + abs(y - prev[3])
            trips[key] = (n + 1, min(lo, t), max(hi, t), ml + move)
            prev = (t, pid, x, y)
    return trips


@pytest.fixture(scope="module")
def pings(spark):
    rows = _synth_pings(12, 80)
    return (
        spark.createDataFrame(
            rows, "user_id long, ping_id long, ts_us long, x long, y long"
        ).cache(),
        rows,
    )


def test_trips_match_brute_force(spark, pings):
    from osm_hadoop_spark.operators.trajectory import segment_trips

    df, rows = pings
    gap_us, jump = 3600 * 1_000_000, 200
    got = {
        (r["user_id"], r["trip"]): (
            r["n_pings"], r["start_us"], r["end_us"], r["manhattan_len"]
        )
        for r in segment_trips(df, gap_us, jump).collect()
    }
    want = _brute_trips(rows, gap_us, jump)
    assert got == want
    # fixture exercises both break causes and multi-ping trips
    assert any(v[0] > 3 for v in want.values())
    assert len({k[1] for k in want}) > 3


def test_trip_endpoints_match_brute_force(spark, pings):
    from osm_hadoop_spark.operators.trajectory import segment_trips

    df, rows = pings
    gap_us, jump = 3600 * 1_000_000, 200
    got = {
        (r["user_id"], r["trip"]): (
            r["start_x"], r["start_y"], r["end_x"], r["end_y"]
        )
        for r in segment_trips(df, gap_us, jump, endpoints=True).collect()
    }
    # brute: first/last ping per trip in (ts, pid) order
    by_e: dict = {}
    for (e, pid, t, x, y) in rows:
        by_e.setdefault(e, []).append((t, pid, x, y))
    want = {}
    for e, ps in by_e.items():
        ps.sort()
        trip, prev = -1, None
        for (t, pid, x, y) in ps:
            if (
                prev is None
                or t - prev[0] > gap_us
                or (x - prev[2]) ** 2 + (y - prev[3]) ** 2 > jump * jump
            ):
                trip += 1
                want[(e, trip)] = [x, y, x, y]
            else:
                want[(e, trip)][2:] = [x, y]
            prev = (t, pid, x, y)
    assert got == {k: tuple(v) for k, v in want.items()}


def test_trip_plan_single_sort(spark, pings):
    from osm_hadoop_spark.operators.trajectory import segment_trips

    df, _ = pings
    plan = (
        segment_trips(df, 10**9, 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both window passes must share one Sort on (entity, ts, tiebreak)
    assert plan.count("+- Sort ") == 1, plan
    assert "Join" not in plan

def test_dwell_segments_known_runs(spark):
    from pyspark.sql import Row

    from osm_hadoop_spark.operators.trajectory import dwell_segments

    # entity 1: dwell in cell (0,0) t=0..40 (3 pings), hop to (5,5) at 50
    # (single ping, too short), back to (0,0) t=60..95 (2 pings)
    rows = [
        Row(entity=1, t=0, seq=1, x=10, y=10),
        Row(entity=1, t=20, seq=2, x=90, y=40),
        Row(entity=1, t=40, seq=3, x=5, y=99),
        Row(entity=1, t=50, seq=4, x=550, y=560),
        Row(entity=1, t=60, seq=5, x=30, y=30),
        Row(entity=1, t=95, seq=6, x=60, y=60),
        # entity 2: continuous dwell, but below min_pings
        Row(entity=2, t=0, seq=1, x=10, y=10),
    ]
    out = dwell_segments(
        spark.createDataFrame(rows), cell_size=100, min_dwell=30, min_pings=2
    )
    got = sorted(
        (r["entity"], r["cx"], r["cy"], r["t0"], r["t1"], r["n_pings"])
        for r in out.collect()
    )
    assert got == [(1, 0, 0, 0, 40, 3), (1, 0, 0, 60, 95, 2)]


def test_dwell_single_exchange_plan(spark):
    from pyspark.sql import Row

    from osm_hadoop_spark.operators.trajectory import dwell_segments

    rows = [Row(entity=1, t=i, seq=i, x=1, y=1) for i in range(5)]
    df = dwell_segments(spark.createDataFrame(rows), 10, 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both windows and the rollup ride one hashpartitioning on entity
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
    assert "BatchEvalPython" not in plan
