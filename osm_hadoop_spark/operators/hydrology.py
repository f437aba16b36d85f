"""D8 hydrology over a gridded DEM: flow direction + flow accumulation.

The raster stack's drainage primitives (the hydrology companion to the
zonal/visibility operators; the reference's raster layer,
raster/Rasterizer.java + rasterstats/ImageRegions, stops at rendering
and zonal readback). D8 (O'Callaghan & Mark 1984): every cell drains to
the steepest-descent neighbor of its 8-neighborhood; flow accumulation
counts the cells whose drainage path passes through each cell.

All arithmetic is exact integer. The steepest-descent comparison is
slope^2 = drop^2 / dist^2 with dist^2 in {1, 2}, cross-multiplied to
m = 2*drop^2 (straight) vs m = drop^2 (diagonal) — monotone in slope and
tie-FREE across categories (2a^2 = b^2 has no positive integer solution,
sqrt(2) being irrational), so the only possible ties are equal drops in
the same distance class, broken deterministically by compass rank
(E < SE < S < SW < W < NW < N < NE, ESRI codes 1..128). Missing
neighbors read as `default_elev` (cells on the study-area rim drain
outward); a cell with no strictly-lower neighbor is a sink (dir 0).

Plan shape (the hexgrid 4-candidate-argmin precedent, scaled to 8):
direction needs every cell's 8 neighbor elevations, which is NOT a join
— each DEM row scatters its elevation to its 8 neighbor positions
(explode over a literal offset array), the center rows union in, and ONE
hash aggregate pivots the <=9 records per cell into (ce, e0..e7); the
argmax is a pure codegen projection over a packed score
m*8 + (7 - rank). One Exchange end to end, no self-join, no Python.

Accumulation is the bounded-round recurrence A_0 = 1,
A_{t+1}(c) = sum over {u : next(u) = c} of A_t(u) (cells reaching c in
exactly t+1 hops), acc = sum of all rounds — each round is one slim
(cx, cy, a) shuffle join against the pointer table plus a semi-join back
to the DEM (flow leaving the study area vanishes). Drops strictly
decrease along a path, so the flow graph is a forest and `rounds` bounds
path length, exactly like the bounded-hop SSSP/pagerank precedents; each
round is localCheckpoint'ed (the kNN per-round pattern) so Catalyst
never re-executes the chain per consumer. At 100 TB the DEM partitions
by cell key, the scatter is a fixed 9x row amplification of slim rows,
and every round's shuffle carries three int64 columns.

Every scalar ladder is written ONCE against the dual-render DSL
(functions/exprdsl.py) and rendered to both engines, so the DuckDB twin
in __spark_entry__.py runs the IDENTICAL formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.functions.exprdsl import Var, bind_spark, greatest, iff

# rank -> (dx, dy, ESRI code); odd ranks are diagonals (dist^2 = 2)
D8_OFFSETS = [
    (1, 0, 1),      # E
    (1, 1, 2),      # SE
    (0, 1, 4),      # S
    (-1, 1, 8),     # SW
    (-1, 0, 16),    # W
    (-1, -1, 32),   # NW
    (0, -1, 64),    # N
    (1, -1, 128),   # NE
]


def _chain(rnk, values, default):
    """rank-indexed 8-way select as a nested iff ladder."""
    e = default
    for k in range(7, -1, -1):
        e = iff(rnk.eq(k), values[k], e)
    return e


def d8_pick_bindings():
    """Packed-argmax ladder; inputs ce, e0..e7 (already defaulted).

    Binds the per-rank drop / scaled slope^2 / score columns and `best`,
    the max packed score (-1 when every neighbor is at or above ce).
    """
    ce = Var("ce")
    b = []

    def let(name, e):
        b.append((name, e))
        return Var(name)

    scores = []
    for k in range(8):
        drop = let(f"dr{k}", ce - Var(f"e{k}"))
        scale = 1 if k % 2 == 1 else 2
        m = let(f"m{k}", drop * drop * scale)
        scores.append(let(f"sc{k}", iff(drop > 0, m * 8 + (7 - k), -1)))
    let("best", greatest(*scores))
    return b


def d8_rank_bindings():
    """Decode rank and per-rank constants from the packed best score."""
    from osm_hadoop_spark.functions.exprdsl import Mod

    best = Var("best")
    b = []

    def let(name, e):
        b.append((name, e))
        return Var(name)

    rnk = let("rnk", iff(best < 0, -1, 7 - Mod(best, 8)))
    let("dxv", _chain(rnk, [o[0] for o in D8_OFFSETS], 0))
    let("dyv", _chain(rnk, [o[1] for o in D8_OFFSETS], 0))
    let("dircode", _chain(rnk, [o[2] for o in D8_OFFSETS], 0))
    let("esel", _chain(rnk, [Var(f"e{k}") for k in range(8)], Var("ce")))
    let("dropv", Var("ce") - Var("esel"))
    return b


def d8_flow_direction(dem: DataFrame, default_elev: int = 0) -> DataFrame:
    """Per-cell D8 verdict.

    `dem`: (cx, cy, elev) — at most one row per cell. Returns
    (cx, cy, dir, nx, ny, dropv): `dir` the ESRI code (0 = sink),
    (nx, ny) the downstream cell (NULL for sinks), `dropv` the
    elevation drop to it (NULL for sinks).
    """
    agg = neighbor_pivot(dem, default_elev)
    out = bind_spark(bind_spark(agg, d8_pick_bindings()), d8_rank_bindings())
    sink = F.col("rnk") < 0
    return out.select(
        "cx",
        "cy",
        F.col("dircode").cast("bigint").alias("dir"),
        F.when(~sink, F.col("cx") + F.col("dxv")).cast("bigint").alias("nx"),
        F.when(~sink, F.col("cy") + F.col("dyv")).cast("bigint").alias("ny"),
        F.when(~sink, F.col("dropv")).cast("bigint").alias("dropv"),
    )


def neighbor_pivot(dem: DataFrame, default_elev: int = 0) -> DataFrame:
    """3x3 stencil assembly shared by D8 and the Horn terrain kernel
    (operators/terrain.py): scatter every cell's elevation to its 8
    neighbor positions (rank = D8_OFFSETS order), union the centers in
    at rank 8, and pivot in ONE hash aggregate to (cx, cy, ce, e0..e7)
    with absent neighbors defaulted.  One Exchange, no self-join.
    """
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).cast("long").alias("dx"),
                F.lit(dy).cast("long").alias("dy"),
                F.lit(k).cast("long").alias("rnk"),
            )
            for k, (dx, dy, _) in enumerate(D8_OFFSETS)
        ]
    )
    scat = dem.select(
        F.explode(offs).alias("o"), "cx", "cy", "elev"
    ).select(
        (F.col("cx") - F.col("o.dx")).alias("cx"),
        (F.col("cy") - F.col("o.dy")).alias("cy"),
        F.col("o.rnk").alias("rnk"),
        F.col("elev").cast("long").alias("elev"),
    )
    center = dem.select(
        "cx", "cy", F.lit(8).cast("long").alias("rnk"), F.col("elev").cast("long")
    )
    agg = (
        center.unionByName(scat)
        .groupBy("cx", "cy")
        .agg(
            F.max(F.when(F.col("rnk") == 8, F.col("elev"))).alias("ce"),
            *[
                F.coalesce(
                    F.max(F.when(F.col("rnk") == k, F.col("elev"))),
                    F.lit(default_elev).cast("long"),
                ).alias(f"e{k}")
                for k in range(8)
            ],
        )
        .filter(F.col("ce").isNotNull())
    )
    return agg


def watershed_basins(
    dem: DataFrame, doublings: int, default_elev: int = 0, checkpoint: bool = True
) -> DataFrame:
    """Basin labeling by pointer doubling over the D8 forest.

    Every cell is labeled with the terminal of its drainage path: the
    sink it ends in, or the last in-DEM cell before flow leaves the
    study area. `p0(c)` is c's in-DEM successor (terminals point at
    themselves — absorbing), and each round squares the pointer,
    p_{k+1}(c) = p_k(p_k(c)), so `doublings` rounds resolve every chain
    of length <= 2^doublings. Drops strictly decrease along a path
    (d8_flow_direction only emits strictly-lower successors), so the
    pointer graph is a forest and the iteration converges; this is the
    classic O(log L)-round alternative to walking chains one hop per
    round — at 100 TB each round is ONE slim 4-int64-column shuffle
    join, and 40-ish rounds of the naive walk become 6 doublings.

    Returns (cx, cy, bx, by): basin terminal per cell.
    """
    nbr = dem.select(F.col("cx").alias("px"), F.col("cy").alias("py"))
    dirs = d8_flow_direction(dem, default_elev)
    p = dirs.join(
        nbr, (dirs.nx == nbr.px) & (dirs.ny == nbr.py), "left"
    ).select(
        dirs.cx,
        dirs.cy,
        F.coalesce(nbr.px, dirs.cx).alias("px"),
        F.coalesce(nbr.py, dirs.cy).alias("py"),
    )
    if checkpoint:
        p = p.localCheckpoint(eager=True)
    for _ in range(doublings):
        q = p.select(
            F.col("cx").alias("qx"),
            F.col("cy").alias("qy"),
            F.col("px").alias("qpx"),
            F.col("py").alias("qpy"),
        )
        p = p.join(q, (p.px == q.qx) & (p.py == q.qy)).select(
            "cx", "cy", F.col("qpx").alias("px"), F.col("qpy").alias("py")
        )
        if checkpoint:
            p = p.localCheckpoint(eager=True)
    return p.select(
        "cx", "cy", F.col("px").alias("bx"), F.col("py").alias("by")
    )


def flow_accumulation(
    dem: DataFrame, rounds: int, default_elev: int = 0, checkpoint: bool = True
) -> DataFrame:
    """Bounded-round D8 flow accumulation.

    acc(c) = number of DEM cells (including c itself) whose drainage
    path reaches c within `rounds` hops. Exact for any DEM whose longest
    flow chain is <= rounds; a documented lower bound otherwise.
    """
    ptr = (
        d8_flow_direction(dem, default_elev)
        .filter(F.col("dir") > 0)
        .select("cx", "cy", "nx", "ny")
    )
    cells = dem.select("cx", "cy")
    if checkpoint:
        ptr = ptr.localCheckpoint(eager=True)
    a = cells.withColumn("a", F.lit(1).cast("long"))
    total = a
    for _ in range(rounds):
        moved = (
            a.join(ptr, ["cx", "cy"])
            .select(
                F.col("nx").alias("cx"), F.col("ny").alias("cy"), F.col("a")
            )
            .groupBy("cx", "cy")
            .agg(F.sum("a").alias("a"))
            .join(cells, ["cx", "cy"], "left_semi")
        )
        a = moved.localCheckpoint(eager=True) if checkpoint else moved
        total = total.unionByName(a)
    return total.groupBy("cx", "cy").agg(F.sum("a").cast("bigint").alias("acc"))


def strahler_order(
    dem: DataFrame, rounds: int, default_elev: int = 0, checkpoint: bool = True
) -> DataFrame:
    """Strahler stream order over the D8 forest (Strahler 1957): leaves
    are order 1; a cell fed by children of max order m is order m+1 when
    two or more children attain m, else m. The classic drainage-network
    classifier (channel hierarchy, stream-network generalization).

    Bounded-round fixpoint: round k finalizes every cell whose upstream
    depth is <= k (same contract as flow_accumulation — exact when the
    longest flow chain fits in `rounds`, a documented lower bound
    otherwise). Each round is one slim (cell, order) join onto the
    pointer forest plus a two-level aggregate: children group by
    (parent, order) with map-side combine, then ONE max-struct argmax
    per parent picks (max order, count at max) — never a collect_list of
    child orders, so a hub cell with millions of inflows costs two hash
    aggregations, not a wide row.
    """
    ptr = (
        d8_flow_direction(dem, default_elev)
        .filter(F.col("dir") > 0)
        .select("cx", "cy", "nx", "ny")
    )
    cells = dem.select("cx", "cy")
    if checkpoint:
        ptr = ptr.localCheckpoint(eager=True)
    o = cells.withColumn("o", F.lit(1).cast("long"))
    for _ in range(rounds):
        fed = (
            o.join(ptr, ["cx", "cy"])
            .groupBy(
                F.col("nx").alias("px"), F.col("ny").alias("py"), "o"
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("px", "py")
            .agg(F.max(F.struct("o", "cnt")).alias("m"))
            .select(
                "px", "py",
                (
                    F.col("m.o")
                    + F.when(F.col("m.cnt") >= 2, 1).otherwise(0)
                ).alias("v"),
            )
        )
        o = (
            cells.join(
                fed,
                (cells.cx == fed.px) & (cells.cy == fed.py),
                "left",
            )
            .select("cx", "cy", F.coalesce("v", F.lit(1)).cast("long").alias("o"))
        )
        if checkpoint:
            o = o.localCheckpoint(eager=True)
    return o.select("cx", "cy", F.col("o").alias("strahler"))


def flow_path_length(
    dem: DataFrame, rounds: int, default_elev: int = 0, checkpoint: bool = True
) -> DataFrame:
    """Longest upstream drainage chain (in hops) ending at each cell —
    the D8 "flow length" grid (time-of-concentration estimation, channel
    longest-path extraction). fl(c) = 0 for ridge cells with no inflow;
    otherwise 1 + max over inflowing children.

    Bounded-round fixpoint with the same contract as flow_accumulation /
    strahler_order: exact when the longest flow chain fits in `rounds`,
    a documented lower bound otherwise. Each round is one slim
    (cell, fl) join onto the pointer forest + a max aggregate (partial
    agg applies — a hub confluence costs a combiner, not a wide row),
    then a left join back onto the cell set; the frame is checkpointed
    per round so the plan stays O(1) deep.
    """
    ptr = (
        d8_flow_direction(dem, default_elev)
        .filter(F.col("dir") > 0)
        .select("cx", "cy", "nx", "ny")
    )
    cells = dem.select("cx", "cy")
    if checkpoint:
        ptr = ptr.localCheckpoint(eager=True)
    f = cells.withColumn("fl", F.lit(0).cast("long"))
    for _ in range(rounds):
        fed = (
            f.join(ptr, ["cx", "cy"])
            .groupBy(F.col("nx").alias("cx"), F.col("ny").alias("cy"))
            .agg((F.max("fl") + 1).alias("v"))
        )
        f = cells.join(fed, ["cx", "cy"], "left").select(
            "cx", "cy", F.coalesce(F.col("v"), F.lit(0)).cast("long").alias("fl")
        )
        if checkpoint:
            f = f.localCheckpoint(eager=True)
    return f.select("cx", "cy", F.col("fl").cast("bigint").alias("fl"))
