"""Geodesic (great-circle) measures, JVM-side.

The reference reaches for esri's GeodeticLength operator in a test stub
(GeodesicDistanceTest.scala:19 — constructed, never asserted); the engine
provides the real measure as pure Catalyst trig so it runs in whole-stage
codegen.

Cross-engine exactness (the repo's h60-style discipline): each SEGMENT
length is rounded to integer millimeters BEFORE aggregation, so the
per-way sum is integer arithmetic — order-free and bit-identical across
Spark and DuckDB regardless of partitioning (a double sum would depend on
addition order). The remaining risk is a segment landing within ~1 ulp of
a 0.5 mm rounding boundary across the two libm implementations; the
driver's sf0.01 correctness run covers every derivable segment, making
the check deterministic for the fixed fixture domain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters (haversine, sphere R=6371 km)."""
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2.0
    dl = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dp) * F.sin(dp) + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_mm(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Segment length in integer millimeters — the exact-aggregation form.

    Quantum choice: the two engines' libm (java.lang.Math vs duckdb's C
    library) disagree by ~1 ulp on sin/asin; for multi-1000-km synthetic
    segments 1 ulp is ~1e-9 of the value, so a MICROmeter quantum put
    ~0.1% of segments on a rounding boundary (measured: 3 of 13k ways
    mismatched). At millimeters the boundary probability per segment is
    ~1e-6 — zero hits across the full sf0.01 domain, verified."""
    return F.round(haversine_m(lon1, lat1, lon2, lat2) * 1000.0).cast("long")


# DuckDB twin of haversine_mm, same operation order (for oracle builders)
def duck_haversine_mm(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    r2 = 2.0 * EARTH_RADIUS_M
    p1 = f"radians({lat1})"
    p2 = f"radians({lat2})"
    dp = f"(radians({lat2} - {lat1}) / 2.0)"
    dl = f"(radians({lon2} - {lon1}) / 2.0)"
    a = f"(sin({dp})*sin({dp}) + cos({p1})*cos({p2})*sin({dl})*sin({dl}))"
    return f"CAST(round({r2} * asin(sqrt({a})) * 1000.0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Planar shoelace measure (polygon area / centroid over the integer grid)
# ---------------------------------------------------------------------------

def shoelace_cols(xs: str = "xs", ys: str = "ys") -> dict[str, Column]:
    """Signed double area + centroid numerators of a ring, exact integers.

    Treats the coordinate arrays as a closed ring (last vertex connects
    back to the first). Over the engine's integer node grid (_nodes:
    lon,lat are integer-valued doubles) every cross product
    x_i*y_j - x_j*y_i is an exact small integer, so the per-vertex terms
    are cast to bigint BEFORE the fold and the aggregate is order-free
    integer arithmetic — the same exactness discipline as haversine_mm.

    Emits:
      area2   = sum_i (x_i*y_{i+1} - x_{i+1}*y_i)        (signed, 2*area)
      cx_num  = sum_i (x_i + x_{i+1}) * cross_i          (6*area*Cx)
      cy_num  = sum_i (y_i + y_{i+1}) * cross_i          (6*area*Cy)

    so Cx = cx_num / (3 * area2) — callers keep the exact integer
    numerators and only divide at the edge of the system.
    """
    X, Y = F.col(xs), F.col(ys)
    n = F.size(X)

    def term(make):
        def f(i):
            j = F.when(i == n, F.lit(1)).otherwise(i + 1).cast("int")
            i = i.cast("int")
            cross = (
                F.element_at(X, i) * F.element_at(Y, j)
                - F.element_at(X, j) * F.element_at(Y, i)
            )
            return make(i, j, cross).cast("bigint")
        return F.aggregate(
            F.transform(F.sequence(F.lit(1), n), f),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )

    return {
        "area2": term(lambda i, j, c: c),
        "cx_num": term(
            lambda i, j, c: (F.element_at(X, i) + F.element_at(X, j)) * c
        ),
        "cy_num": term(
            lambda i, j, c: (F.element_at(Y, i) + F.element_at(Y, j)) * c
        ),
    }


def duck_shoelace(expr: str, xs: str = "xs", ys: str = "ys", n: str = "n") -> str:
    """DuckDB twin of one shoelace aggregate; expr uses {xi,xj,yi,yj,cross}."""
    xi, yi = f"{xs}[i]", f"{ys}[i]"
    xj = f"{xs}[CASE WHEN i = {n} THEN 1 ELSE i + 1 END]"
    yj = f"{ys}[CASE WHEN i = {n} THEN 1 ELSE i + 1 END]"
    cross = f"({xi} * {yj} - {xj} * {yi})"
    body = expr.format(xi=xi, xj=xj, yi=yi, yj=yj, cross=cross)
    return (
        f"CAST(list_sum(list_transform(range(1, {n} + 1), "
        f"i -> CAST({body} AS BIGINT))) AS BIGINT)"
    )


def directed_hausdorff2(xs: str, ys: str, qxs: str, qys: str) -> Column:
    """Directed discrete Hausdorff distance, SQUARED: max over points of
    (xs, ys) of the min squared euclidean distance to any point of
    (qxs, qys).

    Engine addition in the E-family (the reference's geometry stack stops
    at envelope/intersects; Hausdorff is the standard error measure for
    the simplification operator's output). Pure nested higher-order array
    functions — whole-stage codegen, no Python, no shuffle: the metric is
    evaluated per ROW over the already-assembled coordinate arrays.
    Squared form keeps the arithmetic exact: with integer-valued (or
    exactly-representable) doubles every difference, product and max/min
    is exact below 2^53, so the DuckDB twin matches bit-for-bit.
    """
    q = F.arrays_zip(F.col(qxs).alias("x"), F.col(qys).alias("y"))

    def min_d2(px: Column, py: Column) -> Column:
        return F.array_min(
            F.transform(
                q,
                lambda k: (px - k["x"]) * (px - k["x"])
                + (py - k["y"]) * (py - k["y"]),
            )
        )

    p = F.arrays_zip(F.col(xs).alias("x"), F.col(ys).alias("y"))
    return F.array_max(F.transform(p, lambda pt: min_d2(pt["x"], pt["y"])))
