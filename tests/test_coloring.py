"""Greedy coloring (operators/coloring.py): parallel Jones-Plassmann
rounds equal the sequential greedy coloring in (h60 priority, id) order,
and the result is a proper coloring."""

from __future__ import annotations

import hashlib
import random


def _pr(u: int) -> int:
    return int(hashlib.md5(f"gc{u}".encode()).hexdigest()[:15], 16)


def _sequential_greedy(edges):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    color: dict[int, int] = {}
    for u in sorted(adj, key=lambda u: (_pr(u), u)):
        used = {color[v] for v in adj[u] if v in color}
        c = 0
        while c in used:
            c += 1
        color[u] = c
    return color


def test_coloring_equals_sequential_greedy(spark):
    from osm_hadoop_spark.operators.coloring import greedy_coloring

    random.seed(11)
    edges = set()
    while len(edges) < 180:
        a, b = random.randrange(80), random.randrange(80)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    want = _sequential_greedy(edges)
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.color for r in greedy_coloring(df).collect()}
    assert got == want
    assert all(got[a] != got[b] for a, b in edges)  # proper


def test_coloring_mex_fold(spark):
    from pyspark.sql import functions as F

    from osm_hadoop_spark.operators.coloring import mex_of_sorted

    rows = [([0, 1, 2],), ([1, 2],), ([0, 2, 3],), ([],), ([0, 1, 3, 4],)]
    df = spark.createDataFrame(rows, "cs array<bigint>")
    got = [r.m for r in df.select(mex_of_sorted(F.col("cs")).alias("m")).collect()]
    assert got == [3, 0, 1, 0, 2]
