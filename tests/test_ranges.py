"""Balanced range partitioning (operators/ranges.py).

Brute force sorts the key multiset in Python and assigns
bucket = rank * B // N directly — no prefix-sum machinery. Crafted
features: a heavy duplicate key big enough to straddle several bucket
boundaries, and a coarse_div small enough that many coarse buckets are
exercised (including empties between sparse keys). The plan pin: the
ONLY unpartitioned ordered window runs over the coarse-subtotal
relation, never over the row-level data.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from osm_hadoop_spark.operators.ranges import balanced_range_buckets

B = 16


def _brute(keys, b):
    ks = sorted(keys)
    n = len(ks)
    out = {}
    for r, k in enumerate(ks):
        bk = r * b // n
        c, lo, hi = out.get(bk, (0, k, k))
        out[bk] = (c + 1, min(lo, k), max(hi, k))
    return out


def _keys():
    def h(s, m):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m

    keys = [h(f"rk{i}", 3000) for i in range(900)]
    keys += [1500] * 230  # heavy dup: straddles ~4 bucket boundaries at B=16
    return keys


def test_balanced_ranges_match_brute(spark):
    keys = _keys()
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["bucket"]: (r["n_rows"], r["lo"], r["hi"])
        for r in balanced_range_buckets(df, B, coarse_div=64).collect()
    }
    assert got == _brute(keys, B)
    # balance: sizes within 1 of each other, all B buckets present
    sizes = [v[0] for v in got.values()]
    assert len(got) == B
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == len(keys)
    # ranges are disjoint and ordered (adjacent buckets may share the
    # straddling duplicate key)
    for b in range(B - 1):
        assert got[b][2] <= got[b + 1][1]
    # the heavy dup indeed spans multiple buckets
    spanning = [b for b, (_, lo, hi) in got.items() if lo <= 1500 <= hi]
    assert len(spanning) >= 3


def test_balanced_ranges_ordered_window_only_on_coarse(spark):
    keys = _keys()
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    plan = (
        balanced_range_buckets(df, B, coarse_div=64)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # every ordered-window spec over the full rows is partitioned; the
    # single global ordering appears only after the coarse groupBy.
    # Heuristic pin: "Window [sum" specs must list a partition spec
    # except the one whose child aggregates by `coarse`.
    import re

    wins = [ln for ln in plan.splitlines() if "Window [" in ln]
    # an unpartitioned spec starts its windowspecdefinition with an
    # ordering ("<col> ASC"), a partitioned one with a partition column
    global_wins = [
        w
        for w in wins
        if re.search(r"windowspecdefinition\(\w+#\d+L? (ASC|DESC)", w)
    ]
    assert len(wins) == 3
    assert len(global_wins) == 1
    # ... and the single global one is the coarse prefix sum, i.e. it
    # aggregates the subtotal column, not row-level data
    assert "sum(sc#" in global_wins[0] and "coarse#" in global_wins[0]
