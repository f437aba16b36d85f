"""h-bounded stress centrality between hub sets — exact integer
shortest-path counting (Shimbel 1953; the integer core of Brandes'
betweenness framework, 2001).

Betweenness-style centrality asks "how much shortest-path traffic
crosses node v"; full betweenness sums RATIOS sigma_st(v)/sigma_st,
which no integer engine can pin cross-engine. Stress centrality is the
integer member of the family — the raw COUNT of shortest paths through
v — and restricting the pair universe to hub sets S x T (the
facilities/gateways an analyst actually routes between) plus an
explicit hop bound H makes it exact, bounded, and oracle-comparable:

    stress(v) = sum over (s, t) in S x T, s <> t, d_st <= H, v not in {s, t}
                of  sigma_s(v) * sigma_t(v) * [d_s(v) + d_t(v) = d_st]

The bracketed identity (v lies on a shortest s-t path iff its two
distances sum to d_st, in which case exactly sigma_s(v)*sigma_t(v)
paths cross it) is the standard path-counting decomposition. H-bounded
EXACTNESS: any v on a shortest path of a counted pair has
d_s(v) <= d_st <= H and d_t(v) = d_st - d_s(v) <= H, so the two
H-round BFS tables contain every contributing row — the bound
truncates the PAIR universe (d_st <= H), never a counted pair's paths.

Plan shape: one sigma-BFS keyed by (hub, node) — H rounds, each ONE
equi-join frontier x edges + ONE sum-aggregate + ONE anti-join against
visited (the bfs_hops round shape, with sigma summed where bfs_hops
min'd) — then the Brandes composition is a single self-join of the two
BFS tables on the node key, a broadcast of the tiny (s, t, d_st) pair
table, and one final aggregate. State is |hubs| * N rows of 4 ints;
at 100 TB the node key partitions it and rounds reuse the edge table's
partitioning. Integer budget: sigma <= max_deg^H per side, so products
stay far inside int64 for the bounded H this is for.

Reference analog: none — osm-hadoop's graph story stops at way
assembly; this completes the routing family (routing.py BFS/SSSP/
PageRank) with the path-census member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(F.col(src).alias("eu"), F.col(dst).alias("ev"))
        .filter(F.col("eu") != F.col("ev"))
        .unionByName(
            edges.select(F.col(dst).alias("eu"), F.col(src).alias("ev"))
            .filter(F.col(src) != F.col(dst))
        )
        .distinct()
    )


def bfs_sigma(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "u",
    dst: str = "v",
    node: str = "node",
) -> DataFrame:
    """Per-source BFS with shortest-path counts over an undirected
    graph: DataFrame(s, node, dist, sigma) for every (source, node)
    pair within max_hops. sigma(s, v) = number of distinct shortest
    s->v paths — at v's BFS level it is the sum of sigma over v's
    level-(d-1) neighbors, which is exactly what each round's
    aggregate computes."""
    sym = _symmetrize(edges, src, dst).localCheckpoint(eager=True)
    visited = sources.select(
        F.col(node).alias("s"),
        F.col(node).alias("node"),
        F.lit(0).alias("dist"),
        F.lit(1).cast("bigint").alias("sigma"),
    ).localCheckpoint(eager=True)
    frontier = visited
    for d in range(1, max_hops + 1):
        new = (
            frontier.join(sym, frontier["node"] == sym["eu"])
            .groupBy(F.col("s"), F.col("ev").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited.select("s", "node"), ["s", "node"], "anti")
            .select("s", "node", F.lit(d).alias("dist"), "sigma")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    return visited


def stress_centrality(
    edges: DataFrame,
    sources: DataFrame,
    targets: DataFrame,
    max_hops: int,
    src: str = "u",
    dst: str = "v",
    node: str = "node",
) -> DataFrame:
    """DataFrame(node, stress, n_pairs): per interior node, the exact
    number of shortest s->t paths (s in sources, t in targets, s <> t,
    d_st <= max_hops) passing through it, and how many hub pairs
    contribute. Nodes crossed by no counted path are absent."""
    bs = bfs_sigma(edges, sources, max_hops, src, dst, node)
    bt = bfs_sigma(edges, targets, max_hops, src, dst, node)
    t_ids = targets.select(F.col(node).alias("t"))
    # pair table: d_st and sigma_st read straight off the source BFS
    pairs = (
        bs.join(t_ids, bs["node"] == t_ids["t"])
        .filter(F.col("s") != F.col("t"))
        .select("s", "t", F.col("dist").alias("dst"))
    )
    mid = (
        bs.select("s", "node", F.col("dist").alias("ds"),
                  F.col("sigma").alias("sig_s"))
        .join(
            bt.select(F.col("s").alias("t"), "node",
                      F.col("dist").alias("dt"),
                      F.col("sigma").alias("sig_t")),
            "node",
        )
        .join(F.broadcast(pairs), ["s", "t"])
        .filter(
            (F.col("ds") + F.col("dt") == F.col("dst"))
            & (F.col("node") != F.col("s"))
            & (F.col("node") != F.col("t"))
        )
    )
    return mid.groupBy("node").agg(
        F.sum(F.col("sig_s") * F.col("sig_t")).alias("stress"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
