"""AMS F2 sketch (operators/ams.py) vs brute counters + accuracy bound."""

from __future__ import annotations

import hashlib
from collections import Counter


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute(keys, k):
    c = Counter(str(x) for x in keys)
    f2 = sum(v * v for v in c.values())
    sq = 0
    for j in range(k):
        zj = sum(((_h60(f"ams{j}_{kv}") % 2) * 2 - 1) * v
                 for kv, v in c.items())
        sq += zj * zj
    return f2, sq


def test_ams_matches_brute_counters(spark):
    from osm_hadoop_spark.operators.ams import ams_f2

    keys = [i % 17 for i in range(300)] + [5] * 50
    df = spark.createDataFrame([(x,) for x in keys], "user_id long")
    row = ams_f2(df, "user_id", k=16).collect()[0]
    f2, sq = _brute(keys, 16)
    assert (row.f2_exact, row.sq_sum, row.k) == (f2, sq, 16)


def test_ams_estimate_within_bound(spark):
    from osm_hadoop_spark.operators.ams import ams_f2

    # zipf-ish skew: estimator mean sq_sum/k should land within 50% of
    # exact F2 at k=64 (Chebyshev bound is far looser; this pins sanity,
    # and determinism means this can never flake)
    keys = []
    for i in range(1, 40):
        keys += [i] * (200 // i)
    df = spark.createDataFrame([(x,) for x in keys], "user_id long")
    row = ams_f2(df, "user_id", k=64).collect()[0]
    est = row.sq_sum / row.k
    assert abs(est - row.f2_exact) / row.f2_exact < 0.5


def test_ams_distinct_keys_floor(spark):
    from osm_hadoop_spark.operators.ams import ams_f2

    # all-distinct keys: F2 == n exactly; every counter is a +/-1 sum
    df = spark.createDataFrame([(i,) for i in range(100)], "user_id long")
    row = ams_f2(df, "user_id", k=8).collect()[0]
    assert row.f2_exact == 100
    assert row.sq_sum >= 0 and row.k == 8
