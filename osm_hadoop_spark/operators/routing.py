"""Road-graph routing primitives: multi-source BFS hop distance and
bounded-hop weighted shortest distance (SSSP).

The reference extracts road networks (highway-tagged ways,
OsmEntityFilter.scala) but never routes over them; any production user
of a planet-scale road graph immediately needs "distance to the nearest
<source-set>" — isochrone / catchment / nearest-facility queries. This
operator labels every node with its hop distance to the nearest source
node (multi-source BFS), plus the id of the winning source, bounded by
`max_hops` (an isochrone bound).

Algorithm: Pregel-style frontier BFS expressed as DataFrame equi-joins —
exactly the shape a 1000-executor cluster wants:

  round r: frontier JOIN edges on node key -> candidate (neighbor, src);
           min(src) per neighbor; LEFT ANTI against visited; append.

100 TB posture:
  - Every round is one hash equi-join on the node key + one partial-agg
    min + one anti-join — no driver-side state, no collect. The visited
    set and frontier are both DataFrames.
  - Rounds are O(max_hops), NOT O(nodes); `localCheckpoint` per round
    truncates lineage like operators/knn.py and operators/cc.py (the
    reference's analog is its materialized inter-stage SequenceFiles,
    NodeJoiner.scala:67-68).
  - The frontier shrinks as the ball saturates; `isEmpty()` on the new
    frontier terminates early.
  - Skewed hub nodes split under AQE skew-join like every other equi-join
    here.

Determinism: a node first reached at round r takes the MINIMUM source id
over all (source, path) pairs of length r — i.e. label = min over
sources at the minimum hop distance, which is the same quantity an
independent capped path-enumeration (the DuckDB recursive-CTE oracle in
__spark_entry__.py) computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "u",
    dst: str = "v",
    node: str = "node",
    raise_on_exhaustion: bool = False,
) -> DataFrame:
    """Multi-source BFS over an undirected graph.

    edges: DataFrame with columns (src, dst) — one row per edge; treated
        as undirected (symmetrized internally, self-loops dropped).
    sources: DataFrame with column `node` — the source set.
    Returns DataFrame(node, dist, src_id): every node reachable within
    `max_hops` hops, its hop distance to the nearest source, and the
    minimum source id among nearest sources.

    raise_on_exhaustion=True makes truncation loud (the bridges.py
    fail-fast contract): if the frontier is still non-empty after
    `max_hops` rounds — i.e. reachable nodes exist beyond the horizon and
    the returned levels would be PARTIAL — raise RuntimeError instead of
    silently returning the truncated set. Callers whose correctness
    depends on full reachability (e.g. bipartite_census) must set it.
    """
    sym = (
        edges.select(F.col(src).alias("eu"), F.col(dst).alias("ev"))
        .filter(F.col("eu") != F.col("ev"))
        .unionByName(
            edges.select(F.col(dst).alias("eu"), F.col(src).alias("ev")).filter(
                F.col(src) != F.col(dst)
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    visited = sources.select(
        F.col(node).alias("node"),
        F.lit(0).alias("dist"),
        F.col(node).alias("src_id"),
    ).localCheckpoint(eager=True)
    frontier = visited

    for r in range(1, max_hops + 1):
        new = (
            frontier.join(sym, frontier["node"] == sym["eu"])
            .groupBy(F.col("ev").alias("node"))
            .agg(F.min("src_id").alias("src_id"))
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(r).alias("dist"), "src_id")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    else:
        if raise_on_exhaustion:
            # loop ran out of rounds with a live frontier — one more
            # expansion tells us whether anything reachable was missed
            leftover = (
                frontier.join(sym, frontier["node"] == sym["eu"])
                .select(F.col("ev").alias("node"))
                .join(visited.select("node"), "node", "left_anti")
            )
            if not leftover.isEmpty():
                raise RuntimeError(
                    f"bfs_hops: frontier still non-empty after max_hops="
                    f"{max_hops} rounds; results would be truncated "
                    f"(raise max_hops)"
                )
    return visited


def temporal_earliest_arrival(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src: str = "u",
    dst: str = "v",
    ts: str = "t",
    node: str = "node",
    checkpoint: bool = True,
) -> DataFrame:
    """Earliest arrival over a TEMPORAL graph (time-respecting paths).

    Static reachability (bfs_hops) is wrong for contact networks: an
    edge that fired BEFORE you arrived at its tail cannot carry you. A
    path respects time iff contact timestamps are non-decreasing along
    it; this computes EA_r(v) = the earliest arrival time at v over all
    time-respecting paths of <= `rounds` hops from any source (sources
    seeded at time 0; edges are directed instantaneous contacts).

    The relaxation is the Bellman-Ford-shaped bounded-round recurrence
    of the bfs/sssp family with a TIME GATE on the join:
        EA_{r+1}(v) = min(EA_r(v), min{t : (u,v,t) in E, t >= EA_r(u)})
    EA is monotone non-increasing in r, so each round is one slim
    (node, ea) equi-join against the checkpointed edge relation plus a
    min-merge aggregate — same 100 TB posture as sssp, with the gate
    `t >= ea` applied JVM-side inside the join stage.

    Returns DataFrame(node, ea) for every node reached within `rounds`
    hops; sources report ea = 0.
    """
    e = edges.select(
        F.col(src).alias("eu"),
        F.col(dst).alias("ev"),
        F.col(ts).cast("long").alias("et"),
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    ea = sources.select(
        F.col(node).alias("node"), F.lit(0).cast("long").alias("ea")
    )
    if checkpoint:
        ea = ea.localCheckpoint(eager=True)
    for _ in range(rounds):
        relax = (
            ea.join(e, ea["node"] == e["eu"])
            .filter(F.col("et") >= F.col("ea"))
            .groupBy(F.col("ev").alias("node"))
            .agg(F.min("et").alias("ea"))
        )
        ea = (
            ea.unionByName(relax)
            .groupBy("node")
            .agg(F.min("ea").alias("ea"))
        )
        if checkpoint:
            ea = ea.localCheckpoint(eager=True)
    return ea


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    node: str = "node",
) -> DataFrame:
    """Multi-source weighted shortest distance, bounded at `max_hops` edges.

    Bellman-Ford rounds as frontier equi-joins: after round r, `best`
    holds the minimum path weight over all paths of <= r edges from any
    source (the bounded-hop semantics an isochrone wants, and exactly
    what a capped path-enumeration oracle computes). Ties between equal
    distances resolve to the minimum source id — improvement is the
    lexicographic struct(dist, src_id) compare, so the result is the
    MIN over all <= max_hops-edge paths of (weight, source), a
    round-order-free quantity.

    edges: (src, dst, weight) with integer weight >= 0; undirected
        (symmetrized internally, self-loops dropped).
    Returns DataFrame(node, dist, src_id).

    100 TB posture: like bfs_hops, each round is one equi-join on the
    node key + one partial-agg min + one join against `best` — no
    driver state; the per-round frontier is only the IMPROVED nodes, so
    work decays as the ball saturates; `localCheckpoint` truncates
    lineage (the reference materializes inter-stage SequenceFiles for
    the same reason, NodeJoiner.scala:67-68); early exit on an empty
    frontier. Hot hub nodes split under AQE skew-join.
    """
    sym = (
        edges.select(F.col(src).alias("eu"), F.col(dst).alias("ev"), F.col(weight).alias("ew"))
        .filter(F.col("eu") != F.col("ev"))
        .unionByName(
            edges.select(
                F.col(dst).alias("eu"), F.col(src).alias("ev"), F.col(weight).alias("ew")
            ).filter(F.col(src) != F.col(dst))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    best = sources.select(
        F.col(node).alias("node"),
        F.lit(0).cast("long").alias("dist"),
        F.col(node).alias("src_id"),
    ).localCheckpoint(eager=True)
    frontier = best

    for _ in range(max_hops):
        cand = (
            frontier.join(sym, frontier["node"] == sym["eu"])
            .groupBy(F.col("ev").alias("node"))
            .agg(
                F.min(
                    F.struct(
                        (F.col("dist") + F.col("ew")).alias("dist"),
                        F.col("src_id").alias("src_id"),
                    )
                ).alias("c")
            )
            .select("node", F.col("c.dist").alias("dist"), F.col("c.src_id").alias("src_id"))
        )
        improved = (
            cand.join(
                best.select(
                    "node",
                    F.col("dist").alias("_bd"),
                    F.col("src_id").alias("_bs"),
                ),
                "node",
                "left",
            )
            .filter(
                F.col("_bd").isNull()
                | (
                    F.struct(F.col("dist"), F.col("src_id"))
                    < F.struct(F.col("_bd"), F.col("_bs"))
                )
            )
            .select("node", "dist", "src_id")
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        best = (
            best.join(improved.select("node"), "node", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return best


def pagerank_int(
    edges: DataFrame,
    rounds: int = 3,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    src: str = "u",
    dst: str = "v",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Bounded-round PageRank in FIXED-POINT INTEGER arithmetic — the
    canonical whole-graph iterative workload (power iteration), made
    bit-reproducible across engines: ranks start at `scale` per node, and
    each round computes

        pr'(u) = (1 - d) * scale  +  (d * sum_{v -> u} pr(v) DIV deg(v))
                 with d applied as  damp_num DIV damp_den

    using integer division everywhere (all values nonnegative, so Spark's
    truncating DIV and SQL's floor // agree). Floats never appear: the
    usual "PageRank can't be value-verified across engines" excuse
    disappears, at the cost of a deterministic rounding-down bias of at
    most 1 ulp-of-scale per term — irrelevant for ranking, and identical
    in both engines by construction.

    The graph is treated as undirected (symmetrized, self-loops dropped);
    the node set is the nodes with at least one edge, so deg >= 1 and no
    dangling-mass term exists. Each round is ONE equi-join on the node
    key + ONE partial-aggregating sum — the Pregel shape every round-based
    operator here uses — with `localCheckpoint` lineage truncation
    (`bfs_hops`, `cc.py` precedent). Rounds are a fixed hyperparameter
    (power iteration truncated at `rounds`), NOT data-dependent, so the
    plan is statically bounded.

    With `seeds` (a one-column DataFrame of node ids) this becomes
    PERSONALIZED PageRank: the teleport mass — both the initial rank
    `scale` and the per-round (1-d) base — lands ONLY on seed nodes
    (the unnormalized per-seed formulation: each seed receives the same
    base a global-PR node would, so ranks are comparable to the global
    run and stay exact integers with no |S| division). Non-seed ranks
    are then pure d-damped proximity mass — the standard seeded
    relevance score (recommendations, related-entity lookup).

    Returns DataFrame(node, pr) — bigint fixed-point ranks.
    """
    sym = (
        edges.select(F.col(src).alias("eu"), F.col(dst).alias("ev"))
        .filter(F.col("eu") != F.col("ev"))
        .unionByName(
            edges.select(F.col(dst).alias("eu"), F.col(src).alias("ev")).filter(
                F.col(src) != F.col(dst)
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("eu").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    out_share = sym.join(deg, "eu")  # (eu, ev, d) — static, reused each round

    nodes = deg.select(F.col("eu").alias("node"))
    base = (scale * (damp_den - damp_num)) // damp_den
    if seeds is not None:
        seed_flag = seeds.select(
            F.col(seeds.columns[0]).alias("node"),
            F.lit(True).alias("_is_seed"),
        ).distinct()
        nodes = nodes.join(seed_flag, "node", "left").select(
            "node", F.coalesce("_is_seed", F.lit(False)).alias("_is_seed")
        )
        base_col = F.when(F.col("_is_seed"), F.lit(base)).otherwise(F.lit(0))
        pr = nodes.select(
            "node",
            F.when(F.col("_is_seed"), F.lit(scale))
            .otherwise(F.lit(0)).cast("bigint").alias("pr"),
        )
    else:
        base_col = F.lit(base)
        pr = nodes.select("node", F.lit(scale).cast("bigint").alias("pr"))
    for _ in range(rounds):
        contrib = (
            out_share.join(pr, out_share["eu"] == pr["node"])
            .select(
                F.col("ev").alias("node"),
                F.expr("pr div d").alias("share"),
            )
            .groupBy("node")
            .agg(F.sum("share").cast("bigint").alias("c"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    base_col.cast("bigint")
                    + F.expr(
                        f"({damp_num} * coalesce(c, cast(0 as bigint)))"
                        f" div {damp_den}"
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr


def k_core(edges: DataFrame, k: int, src: str = "u", dst: str = "v") -> DataFrame:
    """k-core decomposition membership: iteratively peel nodes of
    degree < k until the fixpoint (Matula & Beck's algorithm, the
    distributed peeling form used for community seeding / graph
    sparsification).

    Input: UNDIRECTED unique edges (one row per pair).  Returns
    DataFrame(node, core_deg): the nodes of the k-core with their degree
    inside the core subgraph.

    Rounds are data-dependent but bounded by the longest peel chain
    (O(log n) on real road/social graphs); each round is ONE degree agg
    + two semi-joins, with `localCheckpoint` truncating lineage exactly
    like bfs_hops/sssp above.  The fixpoint test is "no node dropped
    this round" — a driver-side count, the same O(rounds) control the
    reference's NodeJoiner restart story accepts.
    """
    cur = edges.select(src, dst).localCheckpoint(eager=True)
    while True:
        degs = (
            cur.select(F.col(src).alias("node"))
            .unionByName(cur.select(F.col(dst).alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_deg"))
        ).localCheckpoint(eager=True)
        n_nodes = degs.count()
        keep = degs.filter(F.col("core_deg") >= k).select("node")
        if keep.count() == n_nodes:
            return degs.filter(F.col("core_deg") >= k)
        cur = (
            cur.join(keep.withColumnRenamed("node", src), src, "semi")
            .join(keep.withColumnRenamed("node", dst), dst, "semi")
        ).localCheckpoint(eager=True)


def label_propagation(edges: DataFrame, rounds: int = 3,
                      src: str = "u", dst: str = "v") -> DataFrame:
    """Synchronous label propagation community detection (Raghavan et
    al. 2007), made DETERMINISTIC: each round every node adopts the
    most frequent label among its neighbors PLUS ITSELF (the self-vote
    kills two-coloring oscillation and covers degree-0 nodes
    uniformly), ties to the SMALLEST label — a total order, so rounds
    are reproducible and the cross-engine twin can unroll them.

    Per round: one equi-join (neighbor label lookup), one (node, lbl)
    vote count, one lexicographic struct-max argmax — all hash
    aggregates on the node key, map-side combinable; labels are
    eagerly localCheckpoint'ed per round (lineage truncation, the
    iterative-family convention shared with pagerank_int/k_core).
    Nodes are the endpoints of the symmetrized edge set.

    Returns DataFrame(node, community) after `rounds` rounds.
    """
    e = edges.filter(F.col(src) != F.col(dst)).select(src, dst)
    sym = (
        e.unionByName(e.select(F.col(dst).alias(src), F.col(src).alias(dst)))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col(src).alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(rounds):
        nbr = sym.join(
            labels.select(F.col("node").alias(dst), "lbl"), dst
        ).select(F.col(src).alias("node"), "lbl")
        votes = nbr.unionByName(labels)
        cnt = votes.groupBy("node", "lbl").agg(
            F.count(F.lit(1)).alias("c")
        )
        labels = (
            cnt.select(
                "node",
                F.struct(
                    F.col("c").alias("c"), (-F.col("lbl")).alias("nl")
                ).alias("s"),
            )
            .groupBy("node")
            .agg(F.max("s").alias("s"))
            .select("node", (-F.col("s.nl")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("lbl").alias("community"))


def widest_path(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    node: str = "node",
    source_cap: int = 1 << 62,
) -> DataFrame:
    """Multi-source WIDEST path (maximum bottleneck capacity), bounded
    at `max_hops` edges — Bellman-Ford over the (max, min) semiring:
    the capacity-routing twin of sssp's (min, +). After round r, each
    node holds the maximum over all <= r-edge paths from any source of
    the path's MINIMUM edge capacity. Sources hold `source_cap` (the
    width of the empty path; keep it above every real capacity).

    Unlike sssp, NO source attribution is emitted: the width VALUE has
    bounded-hop optimal substructure (the path realizing width_{u,h-1}
    extended by (u,v) realizes width_{v,h}), but "minimum source among
    max-width paths" does NOT — a narrower prefix from a smaller source
    is discarded at u yet could tie at v — so a per-round argmin would
    be round-order-dependent, not a path-enumeration quantity. The
    honest output is (node, width), which the capped recursive oracle
    reproduces exactly.

    edges: (src, dst, weight) integer capacities >= 0, symmetrized,
    self-loops dropped. Returns (node, width) over REACHED nodes only.

    Plan/posture: identical to sssp — one equi-join + one partial-agg
    max per round, localCheckpoint lineage truncation, rounds a fixed
    hyperparameter.
    """
    sym = (
        edges.select(F.col(src).alias("eu"), F.col(dst).alias("ev"),
                     F.col(weight).alias("ew"))
        .filter(F.col("eu") != F.col("ev"))
        .unionByName(
            edges.select(F.col(dst).alias("eu"), F.col(src).alias("ev"),
                         F.col(weight).alias("ew"))
            .filter(F.col(src) != F.col(dst))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    best = sources.select(
        F.col(node).alias("node"),
        F.lit(source_cap).cast("long").alias("width"),
    ).localCheckpoint(eager=True)
    for _ in range(max_hops):
        cand = (
            best.join(sym, best["node"] == sym["eu"])
            .select(
                F.col("ev").alias("node"),
                F.least(F.col("width"), F.col("ew").cast("long"))
                .alias("width"),
            )
        )
        best = (
            best.unionByName(cand)
            .groupBy("node")
            .agg(F.max("width").alias("width"))
            .localCheckpoint(eager=True)
        )
    return best
