"""Subtree rollup / ancestor closure (operators/hierarchy.py) vs a dict
walker, plus the doubling pin: a depth-100 chain closes in 8 rounds."""

from __future__ import annotations

from collections import defaultdict

import pytest


def _brute_rollup(nodes, parents):
    """nodes: {u: m}; parents: {child: parent}. Returns
    {u: (n_desc, sum_m)} over the subtree including self."""
    kids = defaultdict(list)
    for c, p in parents.items():
        kids[p].append(c)
    out = {}

    def walk(u):
        n, s = 1, nodes[u]
        for c in kids[u]:
            cn, cs = walk(c)
            n, s = n + cn, s + cs
        out[u] = (n, s)
        return n, s

    roots = [u for u in nodes if u not in parents]
    for r in roots:
        walk(r)
    return out


def _forest():
    nodes = {u: u * 7 % 13 for u in range(1, 90)}
    parents = {u: u // 3 for u in range(3, 90) if u % 11 != 0}
    return nodes, parents


def test_rollup_matches_walker(spark):
    from osm_hadoop_spark.operators.hierarchy import subtree_rollup

    nodes, parents = _forest()
    ndf = spark.createDataFrame(list(nodes.items()), "u long, m long")
    pdf = spark.createDataFrame(list(parents.items()), "u long, p long")
    got = {r.node: (r.n_desc, r.sum_m)
           for r in subtree_rollup(ndf, pdf).collect()}
    assert got == _brute_rollup(nodes, parents)
    # roots cut by the gate really start their own subtree
    cut = next(u for u in range(3, 90) if u % 11 == 0)
    assert got[cut][0] >= 1


def test_closure_doubles_depth_100_chain_in_8_rounds(spark):
    from osm_hadoop_spark.operators.hierarchy import ancestor_closure

    chain = [(i, i - 1) for i in range(1, 101)]  # 0 <- 1 <- ... <- 100
    pdf = spark.createDataFrame(chain, "u long, p long")
    # ceil(log2(100)) = 7 doubling rounds; naive iteration would need 100
    anc = ancestor_closure(pdf, max_rounds=8)
    rows = anc.collect()
    assert len(rows) == 100 * 101 // 2  # sum of depths
    assert {r.a for r in rows if r.u == 100} == set(range(100))


def test_leaf_only_and_empty_parents(spark):
    from osm_hadoop_spark.operators.hierarchy import subtree_rollup

    ndf = spark.createDataFrame([(1, 5), (2, 9)], "u long, m long")
    pdf = spark.createDataFrame([], "u long, p long")
    got = {r.node: (r.n_desc, r.sum_m)
           for r in subtree_rollup(ndf, pdf).collect()}
    assert got == {1: (1, 5), 2: (1, 9)}
