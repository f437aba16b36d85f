"""Cost-distance surface: accumulated least-cost over a raster lattice.

The GIS op (GRASS `r.cost`, ArcGIS CostDistance): given a cost raster
and seed cells, compute for every cell the minimum accumulated cost of
any path to a seed, moving between adjacent cells. Standard GIS engines
run a sequential Dijkstra over the whole in-memory raster; here the
raster is a distributed cell TABLE and the propagation is the engine's
bounded Bellman-Ford (operators/routing.py::sssp) over lattice edges
derived relationally — the same fixpoint discipline as bfs/cc, so a
continental-scale cost surface shards like any other table.

Semantics (exact integers):
  - movement is 4-neighborhood (rook). Diagonal moves are deliberately
    excluded: their sqrt(2) factor is irrational and every engine
    approximates it differently; the 4-neighbor surface is exact and is
    what the integer oracle replays. (A diagonal variant would need a
    fixed-point factor — documented tradeoff, not a silent approx.)
  - edge weight between adjacent cells u, v = cost(u) + cost(v), i.e.
    TWICE the conventional average-of-endpoints step cost — kept doubled
    so it stays an integer ("dist2", the way_length_mm/shoelace *2
    convention).
  - seeds start at 0; ties between equal accumulated costs resolve to
    the minimum seed id (sssp's lexicographic struct compare), so the
    surface is a pure function of the input.
  - the propagation is hop-bounded (max_rounds): the result is the exact
    least cost over paths of <= max_rounds steps — the isochrone-style
    semantics the capped recursive oracle can replay. Run to the lattice
    diameter for the unbounded surface.

100 TB posture: lattice edges are a computed-key equi-self-join (J5 — a
cell's neighbor key is arithmetic, no spatial predicate); each round is
one equi-join + one partial-agg min with a localCheckpoint barrier and
improved-frontier decay (see sssp). No raster ever materializes in one
process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.routing import sssp

_PACK = 1 << 20


def _key(cx, cy):
    return (cx * _PACK + cy).cast("bigint")


def lattice_edges(cells: DataFrame) -> DataFrame:
    """(u, v, w) for 4-adjacent OBSERVED cells; w = cost_u + cost_v.
    Right and down offsets only — sssp symmetrizes."""
    probes = cells.select(
        _key(F.col("cx"), F.col("cy")).alias("u"),
        F.col("cost").alias("cu"),
        F.explode(
            F.array(
                _key(F.col("cx") + 1, F.col("cy")),
                _key(F.col("cx"), F.col("cy") + 1),
            )
        ).alias("v"),
    )
    nbr = cells.select(
        _key(F.col("cx"), F.col("cy")).alias("v"), F.col("cost").alias("cv")
    )
    return probes.join(nbr, "v").select(
        "u", "v", (F.col("cu") + F.col("cv")).alias("w")
    )


def cost_distance(
    cells: DataFrame,
    seeds: DataFrame,
    max_rounds: int = 6,
) -> DataFrame:
    """cells: (cx, cy, cost) with integer cost >= 1; seeds: (cx, cy) —
    silently intersected with the observed cells. Returns
    (cx, cy, dist2, src_id) for every cell reached within max_rounds
    steps; dist2 is the doubled accumulated cost (see module docstring),
    src_id the packed key of the winning seed."""
    seed_nodes = (
        seeds.join(cells.select("cx", "cy"), ["cx", "cy"], "semi")
        .select(_key(F.col("cx"), F.col("cy")).alias("node"))
    )
    out = sssp(lattice_edges(cells), seed_nodes, max_hops=max_rounds)
    return out.select(
        (F.col("node") / _PACK).cast("bigint").alias("cx"),
        F.pmod(F.col("node"), F.lit(_PACK)).cast("bigint").alias("cy"),
        F.col("dist").alias("dist2"),
        F.col("src_id").cast("bigint").alias("src_id"),
    )
