"""Spatial autocorrelation: local Moran's I (LISA) over a grid lattice.

The inferential-statistics layer a geospatial warehouse ships on top of
its binning operators (kde/hex_bin/join_counts_grid give DENSITY; this
gives STRUCTURE — is the density clustered, dispersed, or random, and
WHERE). Anselin's local Moran's I with rook (4-neighbor) binary
weights:

    I_i  ∝  z_i * Σ_{j ~ i} z_j      with  z_i = x_i - mean(x)

Everything is kept in EXACT integers by clearing the mean's
denominator: with n cells and S = Σx, use z'_i = n*x_i - S = n*z_i, so

    lisa_num_i = z'_i * Σ_j z'_j     (= n^2 * the usual numerator)

and the global Moran numerator/denominator are exact bigints too —
no float ever appears, the cross-engine twin matches bit-for-bit. The
caller normalizes at presentation time if a float is wanted.

Domain convention (documented, pinned in tests): the lattice is the set
of OBSERVED cells (cells holding >= 1 point); absent neighbors simply
don't contribute (their weight row is missing), the standard treatment
for sparse lattices. n_neighbors is carried so callers can
row-standardize.

Plan: one scalar aggregate (n, S) broadcast back; neighbor sums via a
4-way literal-offset explode + ONE equi-self-join on the packed cell
key + one partial-aggregatable groupBy. No window, no cartesian.

100 TB posture: rows are slim (cell key + count); the self-join key is
the computed neighbor cell id (J5 discipline — computable keys, never a
spatial predicate); overflow bound: |z'| <= n * max_count, so the
products need n^2 * max_count^2 < 2^63 — shard or switch the two
product columns to DECIMAL(38,0) beyond ~10^9-cell lattices (the
aggregate structure is unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morans_i_local(
    cells: DataFrame, cx: str = "cx", cy: str = "cy", val: str = "n"
) -> DataFrame:
    """cells(cx, cy, n) -> DataFrame(cx, cy, z_scaled, neigh_sum,
    n_neighbors, lisa_num): z_scaled = n_cells*x - S exactly; lisa_num =
    z_scaled * neigh_sum (rook weights, observed-cell domain)."""
    stats = cells.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(val).alias("_s")
    )
    z = cells.crossJoin(F.broadcast(stats)).select(
        F.col(cx),
        F.col(cy),
        (F.col("_n") * F.col(val) - F.col("_s")).cast("bigint").alias("z"),
    )
    offs = F.array(
        F.struct(F.lit(1).alias("dx"), F.lit(0).alias("dy")),
        F.struct(F.lit(-1).alias("dx"), F.lit(0).alias("dy")),
        F.struct(F.lit(0).alias("dx"), F.lit(1).alias("dy")),
        F.struct(F.lit(0).alias("dx"), F.lit(-1).alias("dy")),
    )
    probes = z.select(
        F.col(cx).alias("pcx"), F.col(cy).alias("pcy"),
        F.col("z").alias("z_i"), F.inline(offs),
    ).select(
        "pcx", "pcy", "z_i",
        (F.col("pcx") + F.col("dx")).alias("qx"),
        (F.col("pcy") + F.col("dy")).alias("qy"),
    )
    nbr = z.select(
        F.col(cx).alias("qx"), F.col(cy).alias("qy"), F.col("z").alias("z_j")
    )
    agg = (
        probes.join(nbr, ["qx", "qy"])
        .groupBy("pcx", "pcy")
        .agg(
            F.sum("z_j").alias("neigh_sum"),
            F.count(F.lit(1)).alias("n_neighbors"),
        )
    )
    base = z.select(
        F.col(cx).alias("pcx"), F.col(cy).alias("pcy"),
        F.col("z").alias("z0"),
    )
    return (
        base.join(agg, ["pcx", "pcy"], "left")
        .select(
            F.col("pcx").alias(cx),
            F.col("pcy").alias(cy),
            F.col("z0").alias("z_scaled"),
            F.coalesce(F.col("neigh_sum"), F.lit(0)).cast("bigint")
            .alias("neigh_sum"),
            F.coalesce(F.col("n_neighbors"), F.lit(0)).cast("bigint")
            .alias("n_neighbors"),
            (F.col("z0") * F.coalesce(F.col("neigh_sum"), F.lit(0)))
            .cast("bigint").alias("lisa_num"),
        )
    )


def morans_i_global(cells: DataFrame, cx: str = "cx", cy: str = "cy",
                    val: str = "n") -> DataFrame:
    """One row: (n_cells, w_sum, num, den) with Moran's I = (n/W)*num/den
    after un-scaling — num = Σ_i z'_i Σ_j z'_j and den = Σ z'^2 carry the
    shared n^2 factor, so I = (n_cells / w_sum) * num / den exactly."""
    lisa = morans_i_local(cells, cx, cy, val)
    return lisa.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n_neighbors").alias("w_sum"),
        F.sum("lisa_num").alias("num"),
        F.sum(F.col("z_scaled") * F.col("z_scaled")).alias("den"),
    )


def getis_ord_gi(
    cells: DataFrame, cx: str = "cx", cy: str = "cy", val: str = "n"
) -> DataFrame:
    """Getis-Ord Gi* hot-spot statistic (the 'where are the hot spots
    SIGNIFICANT' sibling of LISA) with rook+self binary weights, exact
    integer core: per cell the window sum W_i = Σ_{j ~ i or j = i} x_j,
    the window size k_i, and the mean-cleared numerator

        gi_num_i = n_cells * W_i - k_i * S     (= n * (W_i - k_i * mean))

    positive = hotter than expectation, negative = colder; callers
    attach the usual variance normalization at presentation time (it is
    a per-row scalar formula over these exact sums).

    Same plan shape as morans_i_local: scalar (n, S) broadcast, 5-offset
    inline (4 rook + self), one computed-key equi-self-join, one
    partial-aggregatable groupBy. Exactness and overflow bounds as in
    the module docstring.
    """
    stats = cells.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(val).alias("_s")
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]
        ]
    )
    probes = cells.select(
        F.col(cx).alias("pcx"), F.col(cy).alias("pcy"), F.inline(offs)
    ).select(
        "pcx", "pcy",
        (F.col("pcx") + F.col("dx")).alias("qx"),
        (F.col("pcy") + F.col("dy")).alias("qy"),
    )
    nbr = cells.select(
        F.col(cx).alias("qx"), F.col(cy).alias("qy"), F.col(val).alias("x_j")
    )
    win = (
        probes.join(nbr, ["qx", "qy"])
        .groupBy("pcx", "pcy")
        .agg(
            F.sum("x_j").alias("window_sum"),
            F.count(F.lit(1)).alias("k"),
        )
    )
    return win.crossJoin(F.broadcast(stats)).select(
        F.col("pcx").alias(cx),
        F.col("pcy").alias(cy),
        F.col("window_sum").cast("bigint").alias("window_sum"),
        F.col("k").cast("bigint").alias("k"),
        (F.col("_n") * F.col("window_sum") - F.col("k") * F.col("_s"))
        .cast("bigint").alias("gi_num"),
    )


def mann_kendall(
    series: DataFrame,
    cx: str = "cx",
    cy: str = "cy",
    t: str = "t",
    v: str = "v",
) -> DataFrame:
    """Per-cell Mann-Kendall trend census — the TEMPORAL member of this
    module's inference family (LISA/Gi* ask "is the pattern clustered
    in SPACE"; this asks "is each cell's series trending in TIME", the
    statistic under emerging-hot-spot analysis).

    Exact integer core: over a cell's series ordered by t,

        s_stat = Σ_{i<j} sign(v_j - v_i)                (in [-C(n,2), C(n,2)])
        var18  = n(n-1)(2n+5) - Σ_g t_g(t_g-1)(2t_g+5)  (= 18 * Var(S))

    with the standard tie correction over groups of equal v (size t_g).
    No float appears; callers form z = (S -/+ 1)/sqrt(var18/18) at
    presentation time.  Rows with n = 1 report (1, 0, 0).

    Plan: one pair equi-self-join on the cell key (textbook O(n²) per
    key where n = TIME BINS, bounded by the retention window — the
    theil_sen posture, independent of event volume because the series
    is pre-aggregated) + two partial-aggregatable groupBys.  Returns
    DataFrame(cx, cy, n, s_stat, var18).
    """
    s = series.select(
        F.col(cx).alias("cx"), F.col(cy).alias("cy"),
        F.col(t).cast("bigint").alias("t"),
        F.col(v).cast("bigint").alias("v"),
    )
    n = s.groupBy("cx", "cy").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b = s.alias("a"), s.alias("b")
    d = F.col("b.v") - F.col("a.v")
    pairs = (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(F.col("a.cx").alias("cx"), F.col("a.cy").alias("cy"))
        .agg(
            F.sum(
                F.when(d > 0, 1).when(d < 0, -1).otherwise(0)
            ).cast("long").alias("s_stat")
        )
    )
    c = F.col("c")
    ties = (
        s.groupBy("cx", "cy", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("cx", "cy")
        .agg(
            F.sum(c * (c - 1) * (2 * c + 5)).cast("long").alias("tt")
        )
    )
    nn = F.col("n")
    return (
        n.join(pairs, ["cx", "cy"], "left")
        .join(ties, ["cx", "cy"], "left")
        .select(
            "cx", "cy", "n",
            F.coalesce(F.col("s_stat"), F.lit(0)).cast("long").alias("s_stat"),
            (nn * (nn - 1) * (2 * nn + 5) - F.coalesce(F.col("tt"), F.lit(0)))
            .cast("long").alias("var18"),
        )
    )


def gearys_c_global(
    cells: DataFrame, cx: str = "cx", cy: str = "cy", val: str = "n"
) -> DataFrame:
    """Geary's C numerator/denominator, exact — the pair-difference
    sibling of Moran's I (Moran correlates VALUES with neighbor values;
    Geary sums squared DIFFERENCES, so it is sensitive to local
    contrasts Moran smooths over).  Rook weights on the observed-cell
    lattice, the morans_i_local domain convention.

    One row: (n_cells, w_sum, num, den_scaled) with

        num        = Σ_{i~j} (x_i - x_j)²     (directed rook pairs — raw
                                               values, already integer)
        den_scaled = Σ_i (n x_i - S)²         (= n² Σ (x_i - mean)²)

    so C = (n-1) * n² * num / (2 * W * den_scaled) exactly; callers
    divide at presentation time.  Same plan shape as getis_ord_gi: one
    computed-key equi-self-join + partial-aggregatable sums.
    """
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in [(1, 0), (-1, 0), (0, 1), (0, -1)]
        ]
    )
    probes = cells.select(
        F.col(cx).alias("pcx"), F.col(cy).alias("pcy"),
        F.col(val).alias("x_i"), F.inline(offs),
    ).select(
        "x_i",
        (F.col("pcx") + F.col("dx")).alias("qx"),
        (F.col("pcy") + F.col("dy")).alias("qy"),
    )
    nbr = cells.select(
        F.col(cx).alias("qx"), F.col(cy).alias("qy"), F.col(val).alias("x_j")
    )
    d = F.col("x_i") - F.col("x_j")
    pair_num = probes.join(nbr, ["qx", "qy"]).agg(
        F.sum(d * d).cast("bigint").alias("num"),
        F.count(F.lit(1)).cast("bigint").alias("w_sum"),
    )
    stats = cells.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(val).alias("_s")
    )
    den = (
        cells.crossJoin(F.broadcast(stats))
        .select(
            ((F.col("_n") * F.col(val) - F.col("_s"))
             * (F.col("_n") * F.col(val) - F.col("_s"))).alias("zz"),
            F.col("_n"),
        )
        .groupBy("_n")
        .agg(F.sum("zz").cast("bigint").alias("den_scaled"))
    )
    return den.crossJoin(F.broadcast(pair_num)).select(
        F.col("_n").cast("bigint").alias("n_cells"),
        "w_sum", "num", "den_scaled",
    )


def ripley_k_census(
    points: DataFrame,
    radii: tuple[int, ...],
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Ripley's K pair census at a ladder of radii — the multi-scale
    point-pattern statistic (K(r) above/below pi*r² <=> clustering/
    dispersion at scale r).  Exact core: unordered pair counts with
    integer dist² <= r²; K̂(r) = A * 2*n_pairs / n² at presentation
    time.  ONE blocked distance join at max(radii) (distance_join's
    computed 3x3 cell key — no all-pairs product) feeds a single
    partial-aggregatable conditional-sum census; every radius is
    emitted even when empty.  Returns (r, n_pairs, n_points).
    """
    from osm_hadoop_spark.operators.distance_join import distance_join

    rs = sorted(set(int(r) for r in radii))
    if not rs or rs[0] <= 0:
        raise ValueError("radii must be positive")
    pairs = distance_join(points, None, rs[-1], id_col=id_col, x=x, y=y)
    census = pairs.agg(
        *[
            F.sum(F.when(F.col("dist2") <= r * r, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_c{r}")
            for r in rs
        ]
    )
    n = points.agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    wide = census.crossJoin(F.broadcast(n))
    longf = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("bigint").alias("r"),
                        F.coalesce(F.col(f"_c{r}"), F.lit(0)).alias("n_pairs"),
                    )
                    for r in rs
                ]
            )
        ).alias("e"),
        "n_points",
    )
    return longf.select(
        F.col("e.r").alias("r"),
        F.col("e.n_pairs").cast("bigint").alias("n_pairs"),
        "n_points",
    )


def variogram_census(
    cells: DataFrame,
    max_lag2: int,
    cx: str = "cx",
    cy: str = "cy",
    val: str = "n",
) -> DataFrame:
    """Empirical (semi)variogram census over the cell lattice — the
    multi-lag generalization of gearys_c_global (Geary is the 1-ring
    slice; the variogram's shape over lags is what geostatistics fits
    range/sill/nugget to, the precursor of any kriging surface).  For
    every squared lag h² = dx² + dy² in (0, max_lag2]:

        n_pairs(h²)      unordered cell pairs at that lag
        sum_sq_diff(h²)  Σ (x_i - x_j)²  over those pairs

    (2γ(h) = sum_sq_diff / n_pairs at presentation time.)  Exact
    integers; pairs counted ONCE via the canonical half-plane offset
    set (dx > 0, or dx = 0 and dy > 0).

    Plan: one inline explode of the bounded offset set (|offsets| ~
    pi*max_lag2/2) + ONE computed-key equi-self-join + one
    partial-aggregatable groupBy on h² — the gearys/Gi* shape, never a
    distance join.  Lags with no observed pair are absent (sparse
    lattice convention).
    """
    if max_lag2 < 1:
        raise ValueError("max_lag2 must be >= 1")
    offs = []
    r = int(max_lag2 ** 0.5) + 1
    for dx in range(0, r + 1):
        for dy in range(-r, r + 1):
            if dx * dx + dy * dy <= max_lag2 and (
                dx > 0 or (dx == 0 and dy > 0)
            ):
                offs.append((dx, dy))
    arr = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in offs
        ]
    )
    probes = cells.select(
        F.col(cx).alias("pcx"), F.col(cy).alias("pcy"),
        F.col(val).alias("x_i"), F.inline(arr),
    ).select(
        "x_i",
        (F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"))
        .cast("bigint").alias("lag2"),
        (F.col("pcx") + F.col("dx")).alias("qx"),
        (F.col("pcy") + F.col("dy")).alias("qy"),
    )
    nbr = cells.select(
        F.col(cx).alias("qx"), F.col(cy).alias("qy"), F.col(val).alias("x_j")
    )
    d = F.col("x_i") - F.col("x_j")
    return (
        probes.join(nbr, ["qx", "qy"])
        .groupBy("lag2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(d * d).cast("long").alias("sum_sq_diff"),
        )
    )
