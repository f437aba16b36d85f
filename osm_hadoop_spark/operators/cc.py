"""Connected components: dedup candidate pairs -> cluster labels.

The missing tail of the dedup pipeline: every pair family (MinHash-LSH,
SimHash, n-gram Jaccard, embedding near-dup — operators/dedup.py,
operators/similarity.py) emits PAIRS, but a 100 TB dedup job needs each
document labeled with its duplicate-CLUSTER id (keep one representative
per cluster). Pairs form a graph; labels are its connected components.

Algorithm: the alternating large-star / small-star method (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014) —
converges to per-component stars centered at the minimum node id in
O(log^2 n) rounds (O(log n) observed), using ONLY equi-joins and
hash aggregates:

  large-star: m(u) = min(Gamma(u) + {u}); emit (v, m(u)) for v in
              Gamma(u), v > u
  small-star: orient u > v; m(u) = min(N(u)); emit (v, m(u)) for
              v in N(u), plus (u, m(u))

100 TB posture:
  - No collect_list / no driver materialization: the per-node minimum is
    a partial-aggregatable `min`, and the emission is a join back on the
    node key — both shuffle-friendly; AQE skew-join splits the hot root
    key as stars grow (the known hot spot of this algorithm).
  - Node ids are any orderable type (strings work — doc_ids are used
    directly, no id-densification join needed).
  - Per-round `localCheckpoint` truncates the iterative lineage exactly
    like operators/knn.py's radius rounds (the reference's analog is the
    materialized inter-stage SequenceFiles, NodeJoiner.scala:67-68).
  - Convergence = edge-set fixpoint, checked with one count + one
    left-anti join per round (no driver-side edge copies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as distinct (u < v) pairs, self-loops dropped."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    return e.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """Edges (v, m(u)) for every neighbor v > u, normalized (min, max)."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("mv", "u").alias("m"))
    )
    out = (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.least("v", "m").alias("u"), F.greatest("v", "m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    return out.distinct()


def _small_star(e: DataFrame) -> DataFrame:
    """Orient u > v; attach every small neighbor (and u) to m(u) = min
    neighbor. Output normalized (m, x) with m < x."""
    o = e.select(F.col("v").alias("u"), F.col("u").alias("v"))  # u > v now
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = (
        o.join(mins, "u")
        .select(F.col("m").alias("u"), F.col("v"))  # (m, small neighbor)
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
    )
    centers = mins.select(F.col("m").alias("u"), F.col("u").alias("v"))  # (m, u)
    return nbrs.unionByName(centers).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    return_rounds: bool = False,
    catalog=None,
    table: str = "cc_edges",
    resume: bool = False,
):
    """Label every node appearing in `edges` with its component id (the
    minimum node id of the component). Returns DataFrame(node, component)
    — or (DataFrame, rounds) when return_rounds.

    With `catalog` (a sources.catalog.SnapshotCatalog), each round's edge
    set is a durable snapshot `<table>_round_<k>` carrying per-partition
    lineage/row metrics, and `resume=True` restarts from the last
    completed round after a failure — the north rule's per-stage
    resumability applied to the iterative operator (reference analog: the
    materialized SequenceFiles between MR jobs, NodeJoiner.scala:67-68).
    Without a catalog, rounds use in-memory localCheckpoint."""
    start_round = 0
    e = None
    if catalog is not None and resume:
        r = 0
        while catalog.exists(f"{table}_round_{r}"):
            r += 1
        if r > 0:
            start_round = r - 1
            e = catalog.read(f"{table}_round_{start_round}")
    if e is None:
        e = _normalize(edges, src, dst)
        if catalog is None:
            # eager, deliberately: a lazy checkpoint materialized by the
            # count() below was tried and measured indistinguishable
            # under host noise (dbscan slightly worse, dedup slightly
            # better) — keeping the r02-proven behavior
            e = e.localCheckpoint(eager=True)
        else:
            catalog.write(e, f"{table}_round_0")
            e = catalog.read(f"{table}_round_0")
    n_prev = e.count()
    rounds = start_round
    for rounds in range(start_round + 1, max_iter + 1):
        e_new = _small_star(_large_star(e))
        if catalog is None:
            e_new = e_new.localCheckpoint(eager=True)
        else:
            catalog.write(e_new, f"{table}_round_{rounds}")
            e_new = catalog.read(f"{table}_round_{rounds}")
        n_new = e_new.count()
        if n_new == n_prev and e_new.join(e, ["u", "v"], "left_anti").isEmpty():
            e = e_new
            break
        e, n_prev = e_new, n_new
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")

    # fixpoint is a star per component: u = root (= component min), v = member
    labels = (
        e.select(F.col("v").alias("node"), F.col("u").alias("component"))
        .unionByName(
            e.select(F.col("u").alias("node"), F.col("u").alias("component"))
        )
        .distinct()
    )
    return (labels, rounds) if return_rounds else labels
