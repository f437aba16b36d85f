"""Zonal majority (operators/zonal.py::zonal_mode) vs a Counter brute force."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def test_zonal_mode_matches_counter(spark):
    from osm_hadoop_spark.operators.zonal import zonal_mode

    rows = [
        (_h(f"z{i}", 6), _h(f"v{i}", 5)) for i in range(400)
    ]
    # handcrafted exact tie: zone 50 has vals 7 and 3 twice each -> min val wins
    rows += [(50, 7), (50, 7), (50, 3), (50, 3)]
    df = spark.createDataFrame(rows, "tile_id int, val int")
    got = {
        r.tile_id: (r.mode_val, r.mode_cnt, r.n_vals)
        for r in zonal_mode(df).collect()
    }
    want = {}
    by_zone: dict[int, Counter] = {}
    for z, v in rows:
        by_zone.setdefault(z, Counter())[v] += 1
    for z, c in by_zone.items():
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        want[z] = (best[0], best[1], len(c))
    assert got == want
    assert got[50][0] == 3  # pinned tie-break


def test_zonal_mode_plan_no_sort(spark):
    from osm_hadoop_spark.operators.zonal import zonal_mode

    df = spark.createDataFrame([(1, 2)], "tile_id int, val int")
    plan = zonal_mode(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Sort" not in plan
    assert "Python" not in plan
