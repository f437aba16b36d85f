"""Spatial autocorrelation: join-count statistics over a cell lattice.

Join counts (Cliff & Ord 1973/1981; the binary-attribute ancestor of
Moran's I) measure whether like-valued cells cluster: classify every grid
cell Black/White, count adjacent BB / WW / BW pairs under rook (4-way)
adjacency, and compare to the free-sampling (CSR) expectation. All
arithmetic here is INTEGER-exact — observed counts are plain joins, and
the CSR expectations are emitted as exact rationals (numerator /
denominator bigints) instead of floats:

    E[BB] = J * nB(nB-1)   / (n(n-1))
    E[WW] = J * nW(nW-1)   / (n(n-1))
    E[BW] = J * 2*nB*nW    / (n(n-1))

with n cells, nB black, J total adjacencies. No float ever appears, so a
cross-engine twin matches bit-for-bit.

Lattice convention: the statistic runs over the OCCUPIED cells only —
an adjacency exists when both endpoint cells contain at least one point.
(The classical formulation over a finite fully-enumerated lattice treats
empty cells as White; an unbounded synthetic extent has no finite lattice,
so occupancy defines the graph. Documented, and replicated identically by
the oracle.)

Scale: the cell census is one partial-aggregating hash aggregate; the
adjacency is ONE equi-join of the census against its shifted self on the
computed neighbor key (east + north directed edges, so each undirected
pair is produced exactly once — no dedup pass); the totals are two 1-row
aggregates broadcast back. No inequality predicate, no cartesian product
anywhere, and every relation after the census is |occupied cells| sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_census(points: DataFrame, cell_size: int) -> DataFrame:
    """(cx, cy, n) occupied-cell census of an (x, y) point relation."""
    c = float(cell_size)
    return points.groupBy(
        F.floor(F.col("x") / c).alias("cx"),
        F.floor(F.col("y") / c).alias("cy"),
    ).agg(F.count(F.lit(1)).alias("n"))


def join_count_stats(
    points: DataFrame, cell_size: int = 25, black_min: int = 2
) -> DataFrame:
    """One row per pair class ('BB'/'WW'/'BW'): observed adjacency count
    plus the exact CSR expectation as a bigint rational.

    A cell is Black when it holds >= `black_min` points. Rook adjacency.
    Output: (pair_cls, observed, expect_num, expect_den), where
    expect_num / expect_den is E[pair_cls] under free sampling.
    """
    cells = cell_census(points, cell_size).select(
        "cx", "cy", (F.col("n") >= black_min).alias("black")
    )

    # east + north directed edges: each undirected adjacency exactly once
    nbr = cells.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col("cx") + 1).alias("cx"), F.col("cy").alias("cy")
                ),
                F.struct(
                    F.col("cx").alias("cx"), (F.col("cy") + 1).alias("cy")
                ),
            )
        ).alias("k"),
        F.col("black").alias("black_a"),
    ).select(F.col("k.cx").alias("cx"), F.col("k.cy").alias("cy"), "black_a")

    pair_cls = (
        F.when(F.col("black_a") & F.col("black"), "BB")
        .when(~F.col("black_a") & ~F.col("black"), "WW")
        .otherwise("BW")
    )
    counts = (
        nbr.join(cells, ["cx", "cy"])
        .select(pair_cls.alias("pair_cls"))
        .groupBy("pair_cls")
        .agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    )

    tot = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.col("black").cast("bigint")).cast("bigint").alias("nb"),
    )
    jtot = counts.agg(F.sum("observed").cast("bigint").alias("j"))

    num = (
        F.when(F.col("pair_cls") == "BB", F.col("nb") * (F.col("nb") - 1))
        .when(
            F.col("pair_cls") == "WW",
            (F.col("n_cells") - F.col("nb"))
            * (F.col("n_cells") - F.col("nb") - 1),
        )
        .otherwise(2 * F.col("nb") * (F.col("n_cells") - F.col("nb")))
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(jtot))
        .select(
            "pair_cls",
            "observed",
            (F.col("j") * num).cast("bigint").alias("expect_num"),
            (F.col("n_cells") * (F.col("n_cells") - 1))
            .cast("bigint")
            .alias("expect_den"),
        )
    )


def label_hot_regions(
    points: DataFrame,
    cell_size: int = 25,
    black_min: int = 2,
    off_bits: int = 20,
) -> DataFrame:
    """Raster region labeling: 4-connected components of Black cells
    (>= `black_min` points), rolled up per region — the first stage of
    raster polygonization (GDAL's sieve/polygonize ancestry) and the
    hotspot-region extraction that follows a join-count significance
    test.

    Cells are keyed by an arithmetic pack (cx + 2^off_bits) * 2^(off_bits
    + 1) + (cy + 2^off_bits) — exact in int64 for |coord| < 2^off_bits
    and trivially replicated in SQL (no bit intrinsics needed). Adjacency
    is the same shifted-self equi-join as join_count_stats, restricted to
    Black cells; labeling is operators/cc.py's large/small-star method
    (O(log n) rounds, equi-joins + partial-agg min only), so a
    continent-sized region never concentrates on one task. Isolated Black
    cells have no edge and keep their own key as the region id (the CC
    label is the minimum member key, so labels are consistent).

    Output: (region, n_cells, n_points, min_cx, max_cx, min_cy, max_cy).
    """
    from osm_hadoop_spark.operators.cc import connected_components

    off = 1 << off_bits
    mult = 1 << (off_bits + 1)

    def key(cx, cy):
        return ((cx + off) * mult + (cy + off)).cast("bigint")

    keyed = cell_census(points, cell_size).filter(
        F.col("n") >= black_min
    ).select("cx", "cy", "n", key(F.col("cx"), F.col("cy")).alias("k"))

    nbr = keyed.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col("cx") + 1).alias("cx"), F.col("cy").alias("cy")
                ),
                F.struct(
                    F.col("cx").alias("cx"), (F.col("cy") + 1).alias("cy")
                ),
            )
        ).alias("t"),
        F.col("k").alias("src"),
    ).select(F.col("t.cx").alias("cx"), F.col("t.cy").alias("cy"), "src")
    edges = nbr.join(
        keyed.select("cx", "cy", F.col("k").alias("dst")), ["cx", "cy"]
    ).select("src", "dst")

    labels = connected_components(edges)
    labeled = keyed.join(
        labels, keyed["k"] == labels["node"], "left"
    ).select(
        "cx", "cy", "n", F.coalesce("component", "k").alias("region")
    )
    return labeled.groupBy("region").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("n").cast("bigint").alias("n_points"),
        F.min("cx").cast("bigint").alias("min_cx"),
        F.max("cx").cast("bigint").alias("max_cx"),
        F.min("cy").cast("bigint").alias("min_cy"),
        F.max("cy").cast("bigint").alias("max_cy"),
    )
