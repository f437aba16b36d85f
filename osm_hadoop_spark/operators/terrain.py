"""Horn-method terrain derivatives over a gridded DEM: slope gradient,
aspect sector, and the hillshade illumination numerator.

The surface-analysis companion to the D8 hydrology stack (the
reference's raster layer, raster/Rasterizer.java + rasterstats/
ImageRegions, renders and reads back but derives nothing from the
surface).  Horn (1981), the estimator GDAL's `gdaldem` uses: the
east-west and north-south elevation gradients of a cell are weighted
differences over its 3x3 neighborhood,

    gx = (ne + 2*e + se) - (nw + 2*w + sw)      # 8*cell * dz/dx
    gy = (sw + 2*s + se) - (nw + 2*n + ne)      # 8*cell * dz/dy

Everything downstream is kept integer-exact so the DuckDB twin can
compare values bit-for-bit (the D8 cross-multiplied-slope discipline):

- `gx`, `gy`: the raw integer numerators above (y grows south, matching
  the D8 grid convention).
- `g2 = gx^2 + gy^2`: squared gradient magnitude — a monotone transform
  of slope for a fixed cell size, so ordering/thresholding semantics
  are those of true slope without ever forming atan(sqrt(.)/8cell).
- `aspect`: the D8-coded compass sector (E=1, SE=2, ... NE=128,
  clockwise from east with y down) containing the steepest-DESCENT
  direction (-gx, -gy); 0 for flat cells (g2 = 0).  Sectors are the
  half-open 45-degree wedges [k*45, (k+1)*45) anchored on the compass
  axes, so membership is pure integer sign/|u|-vs-|v| comparisons — no
  trig, no rounding, deterministic on boundaries by the half-open rule.
- `shade`: -(gx + gy), the directional term of the classic NW-light
  hillshade (L.grad z for azimuth 315): for a fixed g2 the true Horn
  hillshade is strictly increasing in this integer, so relative
  brightness within any equal-slope class is exact.

Plan shape: the stencil is NOT a join — hydrology.neighbor_pivot
scatters each cell's elevation to its 8 neighbors and pivots the <=9
records per cell in ONE hash aggregate; the Horn ladder is a pure
codegen projection written once in the dual-render DSL
(functions/exprdsl.py), so the oracle runs the IDENTICAL formula.  At
100 TB the DEM partitions by cell key and the scatter is a fixed 9x
amplification of 3-int64 rows feeding a single Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.functions.exprdsl import Var, bind_spark, iff

# D8_OFFSETS rank order: 0=E 1=SE 2=S 3=SW 4=W 5=NW 6=N 7=NE
_E, _SE, _S, _SW, _W, _NW, _N, _NE = range(8)


def horn_bindings():
    """Integer Horn ladder; inputs ce, e0..e7 (rank order above,
    already defaulted).  Binds gx, gy, g2, shade, and the descent
    components u = -gx, v = -gy with their magnitudes, then `aspect`.
    """
    e = [Var(f"e{k}") for k in range(8)]
    b = []

    def let(name, ex):
        b.append((name, ex))
        return Var(name)

    gx = let("gx", (e[_NE] + 2 * e[_E] + e[_SE]) - (e[_NW] + 2 * e[_W] + e[_SW]))
    gy = let("gy", (e[_SW] + 2 * e[_S] + e[_SE]) - (e[_NW] + 2 * e[_N] + e[_NE]))
    g2 = let("g2", gx * gx + gy * gy)
    let("shade", 0 - (gx + gy))
    u = let("u", 0 - gx)
    v = let("v", 0 - gy)
    # half-open 45-degree wedges, clockwise from east, y grows south:
    # [0,45)=E(1) [45,90)=SE(2) [90,135)=S(4) [135,180)=SW(8)
    # [180,225)=W(16) [225,270)=NW(32) [270,315)=N(64) [315,360)=NE(128)
    let(
        "aspect",
        iff(
            g2.eq(0),
            0,
            iff(
                v >= 0,
                iff(
                    u > 0,
                    iff(v < u, 1, 2),
                    # u <= 0, v >= 0, not both zero
                    iff(v.eq(0), 16, iff((0 - u) < v, 4, 8)),
                ),
                # v < 0
                iff(
                    u < 0,
                    iff((0 - v) < (0 - u), 16, 32),
                    iff(u < (0 - v), 64, 128),
                ),
            ),
        ),
    )
    return b


def horn_terrain(dem: DataFrame, default_elev: int = 0) -> DataFrame:
    """Per-cell Horn terrain verdict.

    `dem`: (cx, cy, elev) — at most one row per cell.  Returns
    (cx, cy, gx, gy, g2, aspect, shade); neighbors outside the DEM read
    as `default_elev` (rim cells slope toward the void, matching the
    D8 rim convention).
    """
    from osm_hadoop_spark.operators.hydrology import neighbor_pivot

    out = bind_spark(neighbor_pivot(dem, default_elev), horn_bindings())
    return out.select(
        "cx",
        "cy",
        F.col("gx").cast("bigint").alias("gx"),
        F.col("gy").cast("bigint").alias("gy"),
        F.col("g2").cast("bigint").alias("g2"),
        F.col("aspect").cast("bigint").alias("aspect"),
        F.col("shade").cast("bigint").alias("shade"),
    )


HILL_SCALE = 240.0  # 8 * cellsize (30 m), z-factor 1 — gdaldem's default geometry


def hillshade255(horn: DataFrame, scale: float = HILL_SCALE) -> DataFrame:
    """(cx, cy, shade255): the classic Horn hillshade under NW light
    (azimuth 315°, altitude 45°) as gdaldem renders it — completing
    the slope/aspect/hillshade trio over horn_terrain's output.

    With altitude 45° the zenith terms collapse to sqrt(0.5), and with
    the NW azimuth the directional dot product is (1 - p - q) for
    p = gx/scale, q = gy/scale (y grows south — the D8 convention, so
    +gx/+gy face away from the light, matching the integer `shade`
    numerator's sign). The full formula

        raw  = 254 * sqrt(0.5) * (1 - p - q) / sqrt(1 + p² + q²) + 1
        shade255 = floor(clamp(raw, 0, 255))

    uses ONLY IEEE-754 +, -, *, /, sqrt, floor — every one of which is
    correctly rounded and therefore BIT-EXACT across Spark and DuckDB
    (the bm25 rational-constant discipline extended to sqrt); the twin
    writes the identical expression shape, so the driver hash-matches
    a float kernel with no tolerance.

    Plan: a pure codegen projection over horn_terrain (itself one
    scatter + one hash aggregate) — no joins, no shuffle added.
    """
    p = F.col("gx").cast("double") / F.lit(float(scale))
    q = F.col("gy").cast("double") / F.lit(float(scale))
    den = F.sqrt(F.lit(1.0) + p * p + q * q)
    raw = (
        F.lit(254.0) * F.sqrt(F.lit(0.5)) * (F.lit(1.0) - p - q) / den
        + F.lit(1.0)
    )
    s = F.floor(F.greatest(F.lit(0.0), F.least(F.lit(255.0), raw)))
    return horn.select("cx", "cy", s.cast("bigint").alias("shade255"))
