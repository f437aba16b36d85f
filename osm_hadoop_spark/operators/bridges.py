"""Bridge detection + 2-edge-connected components, exact and bounded-round.

The cut-edge family the graph tier was missing between components
(cc.py: is it connected?) and trusses (truss.py: how densely?): WHICH
single edges hold the graph together. A bridge is an edge whose removal
disconnects its endpoints; the 2-edge-connected components (2ECC) are
the classes that survive deleting every bridge — the standard
resilience/backbone decomposition (network reliability, road-network
choke points, dedup-cluster fragility).

Mechanism (Tarjan's cover rule, made relational):

  1. connected components (cc.py, reused verbatim) give every node a
     root = its component's minimum node id.
  2. a BFS spanning tree grows from all roots SIMULTANEOUSLY over the
     adjacency — one frontier equi-join per level, parent = the minimum
     previous-level neighbor, so the tree is deterministic and its
     depth is the graph eccentricity from the root (the minimum
     possible for any spanning tree rooted there).
  3. the ancestor closure of the parent pointers (hierarchy.py's
     path-doubling, reused verbatim) closes in ceil(log2 depth) joins;
     subtree membership is then x in subtree(c)  <=>  c in anc*(x).
  4. THE RULE: a tree edge (c -> parent(c)) is a bridge iff NO non-tree
     edge has EXACTLY ONE endpoint inside subtree(c); non-tree edges
     are never bridges (each closes a cycle with its tree path).
     cover(c) = sum over non-tree edges (x, y) of
     [x in sub(c)] XOR [y in sub(c)] — computed as one endpoint-vs-
     closure equi-join, one (edge, ancestor) count, and one filter
     cnt = 1 aggregate. bridge(c) <=> cover(c) = 0.

Everything is equi-joins and hash aggregates on node ids; the only
driver-side iteration is the BFS frontier and the closure doubling,
both under the engine's localCheckpoint fixpoint discipline (cc.py /
knn.py idiom).

100 TB posture: the closure materializes N * avg-depth slim (u, a)
pairs and the cover join fans each non-tree endpoint out by its depth —
both O(N log N) on the low-diameter graphs this family targets (road
meshes, dedup clusters, block graphs). The documented hazard is a
HIGH-ECCENTRICITY component (a 10^6-node path needs 10^6 BFS rounds and
a quadratic closure); the classical mitigation is Euler-tour list
ranking (O(log) rounds independent of depth), which trades this
module's plain relational shape for tour-edge bookkeeping — the BFS
form is the right default at web/road diameters, and max_bfs_rounds
fails fast instead of spinning.

Reference analog: the reference has no graph tier; this extends the
engine's own component family (operators/cc.py) the same way truss.py
and mst.py do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.cc import connected_components
from osm_hadoop_spark.operators.hierarchy import ancestor_closure


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _bfs_parents(
    e: DataFrame,
    max_bfs_rounds: int,
    catalog=None,
    table: str = "bridges",
    resume: bool = False,
) -> DataFrame:
    """Deterministic BFS spanning forest of the canonical edge set:
    (u, p) parent pointers for every non-root node, rooted at each
    component's minimum node id.

    With `catalog` (sources.catalog.SnapshotCatalog) every BFS level is
    a durable snapshot `<table>_bfs_round_<k>` and the nested component
    labeling snapshots under `<table>_cc`; `resume=True` restarts after
    a failure from the last completed level — the north rule's
    per-stage resumability (cc.py discipline) applied to this fixpoint.
    The terminal empty level is written too, so a completed run's BFS
    resumes as a pure replay with no recompute (the nested cc re-runs
    only its one fixpoint-confirmation round, its own resume
    contract)."""
    comp = connected_components(
        e, "u", "v", catalog=catalog, table=f"{table}_cc", resume=resume
    ).select(F.col("node"), F.col("component"))
    adj = (
        e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .localCheckpoint(eager=True)
    )
    roots = comp.filter(F.col("node") == F.col("component")).select(
        F.col("node").alias("u")
    ).localCheckpoint(eager=True)
    # visited stays a UNION of already-checkpointed frontiers — its
    # lineage is one union node per level over materialized leaves, so
    # no per-round checkpoint (or count) is spent on it.
    parent_rounds = []
    done = False
    start_round = 0
    if catalog is not None and resume:
        while catalog.exists(f"{table}_bfs_round_{start_round}"):
            lvl = catalog.read(f"{table}_bfs_round_{start_round}")
            if lvl.limit(1).count() == 0:
                done = True
                break
            parent_rounds.append(lvl)
            start_round += 1
    frontier = parent_rounds[-1].select("u") if parent_rounds else roots
    visited = roots
    for pr in parent_rounds:
        visited = visited.unionByName(pr.select("u"))
    for r in range(start_round, max_bfs_rounds):
        if done:
            break
        nxt = (
            adj.join(frontier, "u")
            .select(F.col("v").alias("u"), F.col("u").alias("p"))
            .join(visited, "u", "anti")
            # a node first reached at this level picks its MINIMUM
            # previous-level neighbor — deterministic tie-break
            .groupBy("u")
            .agg(F.min("p").alias("p"))
        )
        if catalog is None:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            catalog.write(nxt, f"{table}_bfs_round_{r}")
            nxt = catalog.read(f"{table}_bfs_round_{r}")
        if nxt.count() == 0:  # materialized: count is a cache/snapshot scan
            break
        parent_rounds.append(nxt)
        frontier = nxt.select("u")
        visited = visited.unionByName(frontier)
    else:
        if not done:
            raise RuntimeError("bridge_census: max_bfs_rounds exhausted")
    if not parent_rounds:
        return e.filter(F.lit(False)).select(
            F.col("u"), F.col("v").alias("p")
        )
    out = parent_rounds[0]
    for pr in parent_rounds[1:]:
        out = out.unionByName(pr)
    return out


def bridge_census(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_bfs_rounds: int = 64,
    max_closure_rounds: int = 20,
    catalog=None,
    table: str = "bridges",
    resume: bool = False,
) -> DataFrame:
    """(u, v, is_bridge) over the canonical undirected edge set:
    is_bridge true iff removing (u, v) disconnects u from v.

    With `catalog`/`resume`, the component labeling and every BFS level
    are durable snapshots (see _bfs_parents); the ancestor-closure
    doubling (ceil(log2 depth) rounds, cheap to replay) stays in-memory
    by design."""
    e = _canon(edges, src, dst).localCheckpoint(eager=True)
    parents = _bfs_parents(
        e, max_bfs_rounds, catalog=catalog, table=table, resume=resume
    ).localCheckpoint(eager=True)

    tree = parents.select(
        F.least("u", "p").alias("u"), F.greatest("u", "p").alias("v")
    )
    nt = e.join(tree, ["u", "v"], "anti")

    # subtree membership: x in subtree(c) <=> c = x or c in anc(x)
    closure_self = (
        ancestor_closure(parents, src="u", parent="p",
                         max_rounds=max_closure_rounds)
        .unionByName(
            parents.select("u", F.col("u").alias("a"))
        )
    )
    ends = nt.select(
        F.col("u").alias("eu"), F.col("v").alias("ev"),
        F.col("u").alias("node"),
    ).unionByName(
        nt.select(
            F.col("u").alias("eu"), F.col("v").alias("ev"),
            F.col("v").alias("node"),
        )
    )
    # (non-tree edge, ancestor c): how many of its two endpoints lie in
    # subtree(c)? cnt = 1 means the edge CROSSES the (c, parent(c)) cut.
    crossing = (
        ends.join(closure_self.withColumnRenamed("u", "node"), "node")
        .groupBy("eu", "ev", "a")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") == 1)
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("cover"))
    )
    tree_flagged = (
        parents.join(crossing, parents["u"] == crossing["a"], "left")
        .select(
            F.least(parents["u"], F.col("p")).alias("u"),
            F.greatest(parents["u"], F.col("p")).alias("v"),
            (F.coalesce(F.col("cover"), F.lit(0)) == 0).alias("is_bridge"),
        )
    )
    return tree_flagged.unionByName(
        nt.select("u", "v", F.lit(False).alias("is_bridge"))
    )


def two_edge_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_bfs_rounds: int = 64,
    max_closure_rounds: int = 20,
    flags: DataFrame | None = None,
) -> DataFrame:
    """(node, comp2): the 2-edge-connected component label (minimum
    node id reachable without crossing a bridge) for every node of the
    canonical edge set. Endpoints of a bridge always land in different
    labels; endpoints of any non-bridge edge share one. Pass a
    precomputed `flags` frame (bridge_census output) to reuse it — the
    materialized-inter-stage discipline."""
    if flags is None:
        flags = bridge_census(
            edges, src, dst,
            max_bfs_rounds=max_bfs_rounds,
            max_closure_rounds=max_closure_rounds,
        ).localCheckpoint(eager=True)
    nb = flags.filter(~F.col("is_bridge")).select("u", "v")
    comp = connected_components(nb, "u", "v").select(
        F.col("node"), F.col("component").alias("comp2")
    )
    nodes = (
        flags.select(F.col("u").alias("node"))
        .unionByName(flags.select(F.col("v").alias("node")))
        .distinct()
    )
    return nodes.join(comp, "node", "left").select(
        "node", F.coalesce("comp2", F.col("node")).alias("comp2")
    )
