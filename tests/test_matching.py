"""greedy_matching vs the sequential greedy it provably equals."""

import hashlib
import random

import pytest


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _sequential_greedy(edges):
    canon = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    order = sorted(canon, key=lambda e: (_h60(f"me{e[0]}_{e[1]}"), *e))
    matched = set()
    out = set()
    for u, v in order:
        if u not in matched and v not in matched:
            out.add((u, v))
            matched.update((u, v))
    return canon, out


def _run(spark, edges):
    from osm_hadoop_spark.operators.matching import greedy_matching

    df = spark.createDataFrame(edges, "u: long, v: long")
    got = {(r["u"], r["v"]) for r in greedy_matching(df).collect()}
    canon, want = _sequential_greedy(edges)
    assert got == want
    # matching property: every node appears at most once
    nodes = [n for e in got for n in e]
    assert len(nodes) == len(set(nodes))
    # maximality: every canonical edge touches a matched node
    m = set(nodes)
    assert all(u in m or v in m for u, v in canon)
    return got


def test_single_edge(spark):
    assert _run(spark, [(1, 2)]) == {(1, 2)}


def test_triangle_picks_one(spark):
    got = _run(spark, [(0, 1), (1, 2), (2, 0)])
    assert len(got) == 1


def test_path_and_star(spark):
    # star center can match only one leaf; path alternates
    _run(spark, [(0, i) for i in range(1, 6)])
    _run(spark, [(i, i + 1) for i in range(9)])


def test_random_vs_sequential(spark):
    rng = random.Random(1234)
    edges = []
    for _ in range(220):
        u, v = rng.sample(range(60), 2)
        edges.append((u, v))
    _run(spark, edges)


def test_duplicates_and_reversals_ignored(spark):
    got = _run(spark, [(2, 1), (1, 2), (3, 3), (2, 1), (4, 5)])
    assert got == {(1, 2), (4, 5)}


def test_round_guard(spark):
    from osm_hadoop_spark.operators.matching import greedy_matching

    df = spark.createDataFrame([(i, i + 1) for i in range(30)],
                               "u: long, v: long")
    with pytest.raises(RuntimeError, match="max_rounds"):
        greedy_matching(df, max_rounds=1).collect()


def test_fixpoint_on_final_round_no_spurious_raise(spark):
    """If the matching reaches its fixpoint exactly on the last allowed
    round, the guard must NOT fire (ADVICE r3): raising only when edges
    remain active after the loop."""
    from osm_hadoop_spark.operators.matching import greedy_matching

    df = spark.createDataFrame([(i, i + 1) for i in range(12)],
                               "u: long, v: long")
    want = {(r["u"], r["v"]) for r in greedy_matching(df, max_rounds=40).collect()}
    r = 1
    while True:
        try:
            got = {(x["u"], x["v"]) for x in greedy_matching(df, max_rounds=r).collect()}
            break
        except RuntimeError:
            r += 1
            assert r <= 40
    # minimal round count: exactly at the fixpoint boundary, and correct
    assert got == want
    assert r > 1  # the fixture genuinely needs multiple rounds
