"""Basket pair lift (operators/basket.py) vs a Counter brute force."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from itertools import combinations


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _brute(rows, min_support):
    baskets = defaultdict(set)
    for bk, it in rows:
        baskets[bk].add(it)
    n = len(baskets)
    c = Counter()
    cab = Counter()
    for items in baskets.values():
        for it in items:
            c[it] += 1
        for a, b in combinations(sorted(items), 2):
            cab[(a, b)] += 1
    return {
        (a, b): (s, c[a], c[b], n, n * s, c[a] * c[b])
        for (a, b), s in cab.items()
        if s >= min_support
    }


def _synth():
    rows = [(_h(f"b{i}", 40), _h(f"i{i}", 25)) for i in range(600)]
    # planted: items 100/101 co-occur in 5 baskets; 102 rides along twice
    rows += [(900 + j, 100) for j in range(5)]
    rows += [(900 + j, 101) for j in range(5)]
    rows += [(900, 102), (901, 102)]
    # duplicate (basket, item) rows must not inflate any count
    rows += [(900, 100), (900, 100)]
    return rows


def test_basket_lift_matches_brute(spark):
    from osm_hadoop_spark.operators.basket import basket_pair_lift

    rows = _synth()
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        (r.item_a, r.item_b): (r.c_ab, r.c_a, r.c_b, r.n_baskets,
                               r.lift_num, r.lift_den)
        for r in basket_pair_lift(df, min_support=3).collect()
    }
    assert got == _brute(rows, 3)
    assert got[(100, 101)][0] == 5  # planted support survives dup rows


def test_basket_cap_drops_mega_basket(spark):
    from osm_hadoop_spark.operators.basket import basket_pair_lift

    rows = [(1, i) for i in range(50)]          # mega-basket: capped away
    rows += [(b, it) for b in (2, 3, 4) for it in (7, 8)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        (r.item_a, r.item_b): (r.c_ab, r.n_baskets)
        for r in basket_pair_lift(df, min_support=3, basket_cap=10).collect()
    }
    # the capped basket contributes neither pairs nor the basket total
    assert got == {(7, 8): (3, 3)}
