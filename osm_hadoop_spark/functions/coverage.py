"""Exact polygon∩tile coverage fraction — the anti-aliased dual of J3.

The reference's tile join answers "which tiles does this geometry touch"
(GetCellsForImages.scala, the J3 filter-and-refine in
operators/tile_join.py); its raster side burns byte classes per pixel
(TileRasterizer call sites, RoadlessRoadCount.scala:144-157).  What it
never computes is *how much* of each cell a polygon covers — the exact
coverage value a supersampling-free rasterizer, an areal-interpolation
zonal statistic, or a cartographic generalizer needs.  This module adds
that as a closed-form, shuffle-free kernel.

Math — clamped Green's theorem.  clamp_B(p) (coordinatewise clamp of p
into box B) is continuous, maps only q to q for q inside B, and the
straight-line homotopy p -> clamp_B(p) never crosses the interior, so it
preserves the winding number of any closed curve around every interior
point.  Hence

    2 * area(P ∩ B)  =  shoelace of the clamped boundary of P,

and the clamped image of ONE straight edge decomposes over the 9 clamp
regions (3 x-bands × 3 y-bands) of B.  Parameterizing the edge by
s ∈ [0, D], D = max(|dx|,1) * max(|dy|,1), every band boundary lands on
an INTEGER s (x-crossings are multiples of max(|dy|,1), y-crossings of
max(|dx|,1)), so the 9 pieces are statically enumerable as interval
intersections — no sorting, no per-edge branching on crossing order.
Each piece's shoelace cross term collapses to (s_hi - s_lo) * k / D:

    piece band      clamped form          cross contribution * D
    (M , M)         on the line           len * (ax*dy - ay*dx)
    (L , M)         x = XL, y on line     len * XL * dy
    (R , M)         x = XR, y on line     len * XR * dy
    (M , B)         y = YB, x on line     len * (-YB * dx)
    (M , T)         y = YT, x on line     len * (-YT * dx)
    4 corners       a single point        0

so an edge's whole contribution is an integer N over the single
denominator D (proved exactly equal to the Sutherland-Hodgman clip area
by tests/test_coverage.py over thousands of random rings, Fractions, no
floats).  The published value is the engine-exact fixed point

    cov_fp = sum_edges floor(N_e * SCALE / D_e)

(floor via signed-mod + exact division — bit-identical in Spark and
DuckDB), which differs from 2*area*SCALE by less than one unit per edge:
|cov_fp - 2*area*SCALE| < n_edges.

The formula is written ONCE against functions/exprdsl.py and rendered to
both engines, eliminating double-transcription as an error source.

100 TB posture: the operator is explode + map + one hash aggregate —
zero joins, zero Python, whole-stage codegen end to end.  Work is
edges(way) × bbox_cells(way); `max_cells` guards the corrupt-geometry
blowup exactly like the F6 length guard.  For continent-sized polygons
the production upgrade is the classic scanline split (per-row spill
telescoped with a cumulative window) — documented, not needed at the
cell sizes this engine publishes.

Overflow budget (drives the driver query's coordinate derivation): with
|coord| <= M, cell C, scale S, the largest intermediate is
S * len * K <= S * 4M^2 * 4M^2; M=1056, S=128 keeps it < 2^53, the
exact-division bound shared by both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.functions.exprdsl import (
    Var,
    bind_spark,
    floor_div,
    greatest,
    iff,
    least,
    sql_layers,
)

DEFAULT_SCALE = 128


def coverage_bindings(cell: int, scale: int = DEFAULT_SCALE):
    """The dual-rendered ladder.  Input names: ax, ay, bx, byy (edge
    endpoints, integer), tx, ty (cell indices).  Output binding:
    ``cov_fp`` = floor(N * scale / D) for this (edge, cell) pair."""
    ax, ay, bx, byy = Var("ax"), Var("ay"), Var("bx"), Var("byy")
    tx, ty = Var("tx"), Var("ty")

    b = []

    def let(name, e):
        b.append((name, e))
        return Var(name)

    xl = let("xl", tx * cell)
    xr = let("xr", tx * cell + cell)
    yb = let("yb", ty * cell)
    yt = let("yt", ty * cell + cell)
    dx = let("dx", bx - ax)
    dy = let("dy", byy - ay)
    adx = let("adx", greatest(dx, -dx, 1))
    ady = let("ady", greatest(dy, -dy, 1))
    dd = let("dd", adx * ady)
    pos = let("pos", dd + 1)

    # s-values of the clamp-line crossings: s = (X - ax) * D / dx, and
    # D/dx is +-ady exactly (sign of dx), so they are integers.
    sxl = let("sxl", iff(dx > 0, (xl - ax) * ady, (ax - xl) * ady))
    sxr = let("sxr", iff(dx > 0, (xr - ax) * ady, (ax - xr) * ady))
    syb = let("syb", iff(dy > 0, (yb - ay) * adx, (ay - yb) * adx))
    syt = let("syt", iff(dy > 0, (yt - ay) * adx, (ay - yt) * adx))

    neg = -1  # below every s in [0, D]; `pos` is above every one

    # x bands as s-intervals [lo, hi]; empty = [pos, neg].
    xm_lo = let(
        "xm_lo",
        iff(dx.ne(0), least(sxl, sxr),
            iff(xl <= ax, iff(ax <= xr, neg, pos), pos)),
    )
    xm_hi = let(
        "xm_hi",
        iff(dx.ne(0), greatest(sxl, sxr),
            iff(xl <= ax, iff(ax <= xr, pos, neg), neg)),
    )
    xle_lo = let("xle_lo", iff(dx > 0, neg, iff(dx < 0, sxl,
                                                iff(ax < xl, neg, pos))))
    xle_hi = let("xle_hi", iff(dx > 0, sxl, iff(dx < 0, pos,
                                                iff(ax < xl, pos, neg))))
    xri_lo = let("xri_lo", iff(dx > 0, sxr, iff(dx < 0, neg,
                                                iff(ax > xr, neg, pos))))
    xri_hi = let("xri_hi", iff(dx > 0, pos, iff(dx < 0, sxr,
                                                iff(ax > xr, pos, neg))))

    ym_lo = let(
        "ym_lo",
        iff(dy.ne(0), least(syb, syt),
            iff(yb <= ay, iff(ay <= yt, neg, pos), pos)),
    )
    ym_hi = let(
        "ym_hi",
        iff(dy.ne(0), greatest(syb, syt),
            iff(yb <= ay, iff(ay <= yt, pos, neg), neg)),
    )
    ybo_lo = let("ybo_lo", iff(dy > 0, neg, iff(dy < 0, syb,
                                                iff(ay < yb, neg, pos))))
    ybo_hi = let("ybo_hi", iff(dy > 0, syb, iff(dy < 0, pos,
                                                iff(ay < yb, pos, neg))))
    yto_lo = let("yto_lo", iff(dy > 0, syt, iff(dy < 0, neg,
                                                iff(ay > yt, neg, pos))))
    yto_hi = let("yto_hi", iff(dy > 0, pos, iff(dy < 0, syt,
                                                iff(ay > yt, pos, neg))))

    def plen(name, xlo, xhi, ylo, yhi):
        return let(
            name,
            greatest(least(xhi, yhi, dd) - greatest(xlo, ylo, 0), 0),
        )

    l_mm = plen("l_mm", xm_lo, xm_hi, ym_lo, ym_hi)
    l_lm = plen("l_lm", xle_lo, xle_hi, ym_lo, ym_hi)
    l_rm = plen("l_rm", xri_lo, xri_hi, ym_lo, ym_hi)
    l_mb = plen("l_mb", xm_lo, xm_hi, ybo_lo, ybo_hi)
    l_mt = plen("l_mt", xm_lo, xm_hi, yto_lo, yto_hi)

    kk = let("kk", ax * dy - ay * dx)
    nn = let(
        "nn",
        l_mm * kk + xl * dy * l_lm + xr * dy * l_rm
        - yb * dx * l_mb - yt * dx * l_mt,
    )
    let("cov_fp", floor_div(nn * scale, dd))
    return b


def tile_coverage(
    ways: DataFrame,
    cell: int,
    scale: int = DEFAULT_SCALE,
    max_cells: int = 4096,
    carry: list | None = None,
) -> DataFrame:
    """Signed fixed-point coverage of every bbox cell of every ring.

    Input: (way_id, xs: array<long>, ys: array<long>) — an implicit-closure
    ring (last vertex joins back to the first, same convention as
    way_shoelace).  Output: (way_id, tx, ty, cov2s) with
    cov2s = sum_edges floor(N*scale/D) ~= 2 * area(ring ∩ cell) * scale,
    SIGNED by ring orientation (CCW positive), one row per bbox cell —
    including ~0 rows for bbox cells outside the ring, whose floored sum
    lies in (-n_edges, 0].

    Plan: project bbox scalars -> explode edges (arrays dropped) ->
    explode bbox cells -> the dual-rendered ladder -> one hash aggregate.
    No joins, no Python, no window.  `max_cells` drops corrupt rings
    whose bbox cover would amplify (F6-style guard, counted upstream if
    the caller cares).  `carry` names way-constant columns kept on the
    output (they join the grouping keys — free, being functions of
    way_id).
    """
    carry = list(carry or [])
    c = float(cell)
    n = F.size("xs")
    pre = (
        ways.withColumn("tx0", F.floor(F.array_min("xs") / c))
        .withColumn("tx1", F.floor(F.array_max("xs") / c))
        .withColumn("ty0", F.floor(F.array_min("ys") / c))
        .withColumn("ty1", F.floor(F.array_max("ys") / c))
        .filter(
            (F.col("tx1") - F.col("tx0") + 1)
            * (F.col("ty1") - F.col("ty0") + 1)
            <= F.lit(max_cells)
        )
        .filter(n >= 3)
        .withColumn("i", F.explode(F.sequence(F.lit(0), n - 1)))
        .select(
            "way_id", *carry, "tx0", "tx1", "ty0", "ty1",
            F.element_at("xs", F.col("i") + 1).cast("long").alias("ax"),
            F.element_at("ys", F.col("i") + 1).cast("long").alias("ay"),
            F.element_at("xs", (F.col("i") + 1) % F.size("xs") + 1)
            .cast("long").alias("bx"),
            F.element_at("ys", (F.col("i") + 1) % F.size("xs") + 1)
            .cast("long").alias("byy"),
        )
        .withColumn("tx", F.explode(F.sequence("tx0", "tx1")))
        .withColumn("ty", F.explode(F.sequence("ty0", "ty1")))
    )
    return (
        bind_spark(pre, coverage_bindings(cell, scale))
        .groupBy("way_id", *carry, "tx", "ty")
        .agg(F.sum("cov_fp").alias("cov2s"))
    )


def coverage_sql(base_sql: str, cell: int, scale: int = DEFAULT_SCALE) -> str:
    """Render the SAME ladder to SQL.  `base_sql` must yield columns
    (way_id, ax, ay, bx, byy, tx, ty) — one row per (edge, cell)
    candidate; the result is a relation ready for the final aggregate."""
    return sql_layers(base_sql, coverage_bindings(cell, scale))


def areal_interpolate(
    ways: DataFrame,
    total_col: str,
    cell: int,
    scale: int = DEFAULT_SCALE,
    max_cells: int = 4096,
) -> DataFrame:
    """Dasymetric (areal-weighted) disaggregation: split each zone's
    integer total across grid cells proportionally to the EXACT overlap
    area — the canonical polygon->raster population/count interpolation
    (the raster dual of A5's raster->vector zonal histogram).

    Semantics (pinned, engine-exact):
      * per-way orientation is canonicalized by the sign of the way's
        summed coverage, so CW and CCW rings allocate identically;
      * the (-n_edges, 0] fixed-point residue of zero-overlap bbox cells
        is clamped to 0 (it is never real coverage — the fixed-point
        bound test proves |residue| < n_edges);
      * shares are floored: alloc = floor(total * c / sum(c)); the
        <n_cells rounding remainder stays unallocated by design (a
        largest-remainder pass would need a per-way sort for <n_cells
        units — not worth an Exchange);
      * degenerate ways (zero canonical coverage everywhere) drop.

    Plan: repartition(way_id) FIRST (spread-before-amplify, round-2
    audit), so the kernel's (way_id, tx, ty) aggregate AND both way_id
    windows all reuse that one Exchange — the whole operator costs
    exactly one shuffle.
    """
    cov = tile_coverage(
        ways.repartition("way_id"), cell, scale, max_cells, carry=[total_col]
    )
    from pyspark.sql import Window

    w = Window.partitionBy("way_id")
    canon = cov.withColumn(
        "c",
        F.greatest(
            F.when(F.sum("cov2s").over(w) < 0, -F.col("cov2s")).otherwise(
                F.col("cov2s")
            ),
            F.lit(0).cast("long"),
        ),
    )
    num = F.col(total_col) * F.col("c")
    den = F.sum("c").over(w)
    return (
        canon.withColumn("den", den)
        .filter(F.col("den") > 0)
        .select(
            "way_id", "tx", "ty",
            ((num - F.pmod(num, F.col("den"))) / F.col("den"))
            .cast("long").alias("alloc"),
        )
    )
