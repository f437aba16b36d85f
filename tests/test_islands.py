"""Gaps-and-islands (operators/islands.py) vs a sequential brute force."""

from __future__ import annotations

import hashlib

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _synth_intervals(n):
    rows = []
    for i in range(n):
        k = i % 9
        s = _h(f"s{i}", 10000)
        rows.append((k, i, s, s + _h(f"d{i}", 900) + 1))
    # touching pair (must merge) and a contained interval
    rows += [(50, 900, 0, 10), (50, 901, 10, 20), (50, 902, 2, 5)]
    return rows


def _brute(rows):
    by_k = {}
    for (k, i, s, e) in rows:
        by_k.setdefault(k, []).append((s, i, e))
    out = {}
    for k, iv in by_k.items():
        iv.sort()
        island = -1
        max_end = None
        for (s, i, e) in iv:
            if max_end is None or s > max_end:
                island += 1
                out[(k, island)] = [s, e, 1]
            else:
                out[(k, island)][1] = max(out[(k, island)][1], e)
                out[(k, island)][2] += 1
            max_end = e if max_end is None else max(max_end, e)
    return {kk: tuple(v) for kk, v in out.items()}


@pytest.fixture(scope="module")
def interval_df(spark):
    rows = _synth_intervals(500)
    return (
        spark.createDataFrame(
            rows, "user_id long, interval_id long, start_us long, end_us long"
        ).cache(),
        rows,
    )


def test_islands_match_brute(spark, interval_df):
    from osm_hadoop_spark.operators.islands import merge_islands

    df, rows = interval_df
    got = {
        (r["user_id"], r["island"]): (
            r["island_start"], r["island_end"], r["n_intervals"]
        )
        for r in merge_islands(df).collect()
    }
    want = _brute(rows)
    assert got == want
    # touching pair merged with the contained one: a single 3-interval island
    assert got[(50, 0)] == (0, 20, 3)
    # fixture produces real merge structure
    assert any(v[2] > 3 for v in want.values())


def test_islands_plan_single_sort(spark, interval_df):
    from osm_hadoop_spark.operators.islands import merge_islands

    df, _ = interval_df
    plan = merge_islands(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("+- Sort ") == 1, plan
    assert "Join" not in plan
