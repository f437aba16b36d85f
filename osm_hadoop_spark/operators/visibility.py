"""Line-of-sight (intervisibility) over a gridded DEM.

The viewshed primitive the reference's raster stack stops short of:
given observer→target pairs with absolute heights and a DEM table
(cell → elevation), decide per pair whether the straight sight line
clears every intermediate terrain cell. The discrete line is the SAME
walk as the reference's Bresenham (raster/Rasterizer.java:22-134) via
the proved closed form (functions/raster.py): slow_k = slow_1 +
floor((2k*d_slow + d_fast)/(2*d_fast)), k = 0..d_fast in the
fast-axis-ascending frame. The sight-line height test is exact
cross-multiplied integer arithmetic — blocked at step k iff

    elev_k * K >= hA*(K - k) + hB*k        (K = d_fast)

i.e. elevation reaches the linear interpolation between the endpoint
heights; no floats anywhere, so the DuckDB twin matches bit-for-bit.

Every scalar ladder below is written ONCE against the dual-render DSL
(functions/exprdsl.py) and rendered to both engines — the Spark plan is
JVM-only: one explode(sequence) over the intermediate steps, one
equi-join against the DEM on the cell key, one hash aggregate. Pairs
whose lines have no intermediate cell (d_fast < 2) bypass the walk
through a cheap union branch instead of a join-back.

At 100 TB the DEM is the big side: the walk relation is
|pairs| * avg_line_length slim rows, the join is a plain shuffle
equi-join on the packed cell key (broadcast-able when the DEM region is
small — `broadcast_dem=True`), and the aggregate carries its grouping
columns so there is no second join. Blocking reports are deterministic:
`first_block` is the min blocking step counted FROM THE OBSERVER
(swap-corrected), not from the normalized frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.functions.exprdsl import Var, bind_spark, floor_div, iff


def _let_ladder():
    b = []

    def let(name, e):
        b.append((name, e))
        return Var(name)

    return b, let


def los_norm_bindings():
    """Normalize a pair to the fast-axis-ascending Bresenham frame.

    Input names: ox, oy, tx, ty (integer cells), oh, th (absolute
    heights). Output bindings: xfast, swp (0/1 ints), dfast, dslow,
    fast1, slow1, ha, hb — ha is the height at normalized step 0.
    """
    ox, oy, tx, ty = Var("ox"), Var("oy"), Var("tx"), Var("ty")
    oh, th = Var("oh"), Var("th")
    b, let = _let_ladder()

    adx = let("adx", iff(tx > ox, tx - ox, ox - tx))
    ady = let("ady", iff(ty > oy, ty - oy, oy - ty))
    xfast = let("xfast", iff(ady < adx, 1, 0))  # ties -> y-fast, as E5
    swp = let("swp", iff(xfast.eq(1), iff(tx < ox, 1, 0), iff(ty < oy, 1, 0)))
    px1 = let("px1", iff(swp.eq(1), tx, ox))
    py1 = let("py1", iff(swp.eq(1), ty, oy))
    px2 = let("px2", iff(swp.eq(1), ox, tx))
    py2 = let("py2", iff(swp.eq(1), oy, ty))
    let("dfast", iff(xfast.eq(1), px2 - px1, py2 - py1))
    let("dslow", iff(xfast.eq(1), py2 - py1, px2 - px1))
    let("fast1", iff(xfast.eq(1), px1, py1))
    let("slow1", iff(xfast.eq(1), py1, px1))
    let("ha", iff(swp.eq(1), th, oh))
    let("hb", iff(swp.eq(1), oh, th))
    return b


def los_step_bindings():
    """Cell of intermediate step k (1 <= k <= dfast-1) via the closed
    form; input names: k + the norm bindings."""
    k = Var("k")
    xfast, dfast, dslow = Var("xfast"), Var("dfast"), Var("dslow")
    fast1, slow1 = Var("fast1"), Var("slow1")
    b, let = _let_ladder()
    fast = let("fast", fast1 + k)
    slow = let("slow", slow1 + floor_div(k * dslow * 2 + dfast, dfast * 2))
    let("cx", iff(xfast.eq(1), fast, slow))
    let("cy", iff(xfast.eq(1), slow, fast))
    return b


def los_block_bindings():
    """Blocking predicate once `elev` is attached: exact cross-multiplied
    comparison against the interpolated sight line + observer-frame step."""
    k, dfast, swp = Var("k"), Var("dfast"), Var("swp")
    ha, hb, elev = Var("ha"), Var("hb"), Var("elev")
    b, let = _let_ladder()
    let("blockedi", iff(elev * dfast >= ha * (dfast - k) + hb * k, 1, 0))
    let("obs_k", iff(swp.eq(1), dfast - k, k))
    return b


_OUT = ["pair_id", "steps", "n_blocked", "first_block", "visible"]


def line_of_sight(
    pairs: DataFrame,
    dem: DataFrame,
    default_elev: int = 0,
    broadcast_dem: bool = False,
) -> DataFrame:
    """Per-pair visibility verdicts.

    `pairs`: (pair_id, ox, oy, tx, ty, oh, th) — integer cells, absolute
    endpoint heights. `dem`: (cx, cy, elev) — at most one row per cell.
    Missing DEM cells read as `default_elev`. Returns one row per pair:
    (pair_id, steps, n_blocked, first_block, visible) — `steps` = number
    of fast-axis steps (line length), `first_block` = smallest blocking
    step counted from the observer (NULL when visible), `visible` 0/1.
    """
    base = bind_spark(pairs, los_norm_bindings())

    trivial = base.filter(F.col("dfast") < 2).select(
        "pair_id",
        F.col("dfast").cast("bigint").alias("steps"),
        F.lit(0).cast("bigint").alias("n_blocked"),
        F.lit(None).cast("bigint").alias("first_block"),
        F.lit(1).cast("bigint").alias("visible"),
    )

    walk = base.filter(F.col("dfast") >= 2).withColumn(
        "k", F.explode(F.sequence(F.lit(1).cast("long"), F.col("dfast") - 1))
    )
    walk = bind_spark(walk, los_step_bindings())
    dem_side = dem.select("cx", "cy", F.col("elev").cast("bigint").alias("_dem_elev"))
    if broadcast_dem:
        dem_side = F.broadcast(dem_side)
    walk = walk.join(dem_side, ["cx", "cy"], "left").withColumn(
        "elev", F.coalesce(F.col("_dem_elev"), F.lit(default_elev).cast("bigint"))
    )
    walk = bind_spark(walk, los_block_bindings())
    judged = (
        walk.groupBy("pair_id", "dfast")
        .agg(
            F.sum("blockedi").cast("bigint").alias("n_blocked"),
            F.min(F.when(F.col("blockedi") == 1, F.col("obs_k"))).alias(
                "first_block"
            ),
        )
        .select(
            "pair_id",
            F.col("dfast").cast("bigint").alias("steps"),
            "n_blocked",
            F.col("first_block").cast("bigint").alias("first_block"),
            (F.col("n_blocked") == 0).cast("bigint").alias("visible"),
        )
    )
    return trivial.unionByName(judged)


def viewshed(
    observers: DataFrame,
    dem: DataFrame,
    radius: int,
    default_elev: int = 0,
    broadcast_dem: bool = False,
) -> DataFrame:
    """Per-observer viewshed census over a square Chebyshev window:
    every cell within `radius` is a sight-line target whose height is
    the terrain surface itself (DEM elevation, `default_elev` when the
    cell is uncovered), and the verdict reuses line_of_sight verbatim —
    same closed-form Bresenham walk, same exact integer blocking test.

    `observers`: (obs_id, ox, oy, oh) with oh the ABSOLUTE observer
    height. Returns (obs_id, n_cells, n_visible) with n_cells =
    (2*radius+1)^2 - 1.

    Plan: a bounded (2R+1)^2 explode per observer (the window is the
    workload, not a skew risk), one left join to the DEM for target
    heights, then the LOS pipeline (explode + DEM join + aggregate) and
    a final per-observer hash aggregate on the id recovered from the
    packed pair key. Cost is O(observers * R^2 * R) walk rows — linear
    in observers, cubic in the radius, all JVM-side.
    """
    r = radius
    w = 2 * r + 1
    if w * w > _VIEWSHED_PACK:
        raise ValueError("radius too large for the pair-id packing")
    tgt = (
        observers.withColumn(
            "_dx", F.explode(F.sequence(F.lit(-r).cast("long"),
                                        F.lit(r).cast("long")))
        )
        .withColumn(
            "_dy", F.explode(F.sequence(F.lit(-r).cast("long"),
                                        F.lit(r).cast("long")))
        )
        .filter((F.col("_dx") != 0) | (F.col("_dy") != 0))
        .select(
            (
                F.col("obs_id") * _VIEWSHED_PACK
                + (F.col("_dx") + r) * w + (F.col("_dy") + r)
            ).alias("pair_id"),
            "ox", "oy", "oh",
            (F.col("ox") + F.col("_dx")).alias("tx"),
            (F.col("oy") + F.col("_dy")).alias("ty"),
        )
    )
    dem_t = dem.select(
        F.col("cx").alias("tx"), F.col("cy").alias("ty"),
        F.col("elev").cast("bigint").alias("_telev"),
    )
    if broadcast_dem:
        dem_t = F.broadcast(dem_t)
    pairs = (
        tgt.join(dem_t, ["tx", "ty"], "left")
        .withColumn(
            "th",
            F.coalesce(F.col("_telev"), F.lit(default_elev).cast("bigint")),
        )
        .select("pair_id", "ox", "oy", "tx", "ty", "oh", "th")
    )
    verdicts = line_of_sight(
        pairs, dem, default_elev=default_elev, broadcast_dem=broadcast_dem
    )
    return (
        verdicts.groupBy(
            F.expr(f"pair_id DIV {_VIEWSHED_PACK}").alias("obs_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("visible").cast("bigint").alias("n_visible"),
        )
    )


_VIEWSHED_PACK = 10_000
