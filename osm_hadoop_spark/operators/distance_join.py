"""Distance-band join: all pairs within radius r, as one grid equi-join.

The missing member of the engine's spatial-join family (J-series,
SURVEY.md section 2.3): J3 joins ways to tiles, J5 assigns points to
cells, J6 answers kNN — this answers "every pair of features within r of
each other" (distance-band weights in spatial statistics, conflation
candidates, proximity alerts). operators/clustering.py embeds a
specialized variant (dense-cell halving) inside DBSCAN; this is the
standalone, composable form.

Shape: the left side probes the 3x3 neighborhood of its r-sized cell as
a slim replicated relation; the right side is keyed by its own cell; ONE
equi-join on the packed int64 cell id produces every candidate, and the
exact integer squared-distance refine keeps true pairs. No cross
product, no theta-join — the same computable-key discipline as the PIP
grid re-plan (PARITY.md round-3 audits).

Exactness: integer coordinates, integer dist2 = dx*dx + dy*dy <= r*r —
a DuckDB O(n^2) twin matches bit-for-bit.

100 TB posture: shuffle keys are arithmetic cell ids (both sides
partition by locality, so matching cells co-locate); the probe side
replicates 9x as (id, x, y, cell) only; AQE skew-join splits hot cells.
A self-join on a table with a c-point cell still enumerates c^2 in-cell
candidates — for the DBSCAN use-case that term is eliminated by
dense-cell contraction (operators/clustering.py); for a raw pair listing
it is irreducible output (the answer itself is c^2 pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACK = 1 << 32


def distance_join(
    left: DataFrame,
    right: DataFrame | None,
    radius: int,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Pairs within `radius` (inclusive, Euclidean, integer coords).

    Returns DataFrame(id_a, id_b, dist2). With right=None performs a
    self-join emitting each unordered pair once (id_a < id_b, self-pairs
    dropped); with a right side, emits every (left, right) pair
    (including id equality — the ids are different tables' keys).
    """
    if radius <= 0:
        raise ValueError("radius must be > 0")

    def prep(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.col(x).cast("bigint").alias("x"),
            F.col(y).cast("bigint").alias("y"),
        )

    self_join = right is None
    l_pts, r_pts = prep(left), prep(left if self_join else right)

    cell = (
        F.floor(F.col("x") / radius) * _PACK + F.floor(F.col("y") / radius)
    ).cast("bigint")
    off = F.sequence(F.lit(-1), F.lit(1))
    probes = (
        l_pts.withColumn("_cell", cell)
        .withColumn("_dx", F.explode(off))
        .withColumn("_dy", F.explode(off))
        .select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("_cell") + F.col("_dx") * _PACK + F.col("_dy"))
            .cast("bigint")
            .alias("_cell"),
        )
    )
    keyed = r_pts.select(
        F.col("id").alias("id_b"), F.col("x"), F.col("y"), cell.alias("_cell")
    )
    dist2 = (F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x")) + (
        F.col("ya") - F.col("y")
    ) * (F.col("ya") - F.col("y"))
    out = (
        probes.join(keyed, "_cell")
        .filter(dist2 <= radius * radius)
        .select("id_a", "id_b", dist2.alias("dist2"))
    )
    if self_join:
        out = out.filter(F.col("id_a") < F.col("id_b"))
    return out


def geodesic_pairs(
    points: DataFrame,
    radius_m: int,
    cell_deg: float = 1.0,
    max_abs_lat: float = 60.0,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Great-circle distance-band self-join: unordered pairs within
    radius_m METERS on the sphere (id_a < id_b, geo_mm = integer-mm
    haversine distance).

    The geodesic sibling of distance_join: same computable-key 3x3 grid
    blocking, but cells are lon/lat DEGREES and the refine is
    functions/geodesic.py::haversine_mm — the engine-wide integer-mm
    quantization whose cross-libm safety is characterized there, so the
    DuckDB twin (duck_haversine_mm) gates on the identical integer.

    Correct blocking requires the cell to dominate the radius in ground
    distance: cell_deg >= radius_m / (111320 * cos(max_abs_lat)) in
    longitude and radius_m / 110574 in latitude. The constructor asserts
    both; points beyond +-max_abs_lat are REJECTED at plan time via an
    assertion column (polar caps shrink lon cells without bound — the
    standard fix is a polar-cap special case, out of scope and
    documented, same honesty rule as the diagonal-free cost_distance).

    100 TB posture: identical to distance_join — slim 9x probe
    replication, one equi-join on the packed cell id, AQE for hot cells.
    """
    import math

    from osm_hadoop_spark.functions.geodesic import haversine_mm

    if cell_deg * 110574.0 < radius_m:
        raise ValueError("cell_deg too small for radius in latitude")
    if cell_deg * 111320.0 * math.cos(math.radians(max_abs_lat)) < radius_m:
        raise ValueError("cell_deg too small for radius at max_abs_lat")

    cx = F.floor((F.col(lon) + 360.0) / cell_deg).cast("bigint")
    cy = F.floor((F.col(lat) + 90.0) / cell_deg).cast("bigint")
    base = points.select(
        F.col(id_col).alias("pid"), F.col(lon).alias("plon"),
        F.col(lat).alias("plat"), cx.alias("cx"), cy.alias("cy"),
    )
    keyed = base.select(
        F.col("pid").alias("id_b"), F.col("plon").alias("lon_b"),
        F.col("plat").alias("lat_b"),
        (F.col("cx") * _PACK + F.col("cy")).alias("cell"),
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    probe = base.select(
        F.col("pid").alias("id_a"), F.col("plon").alias("lon_a"),
        F.col("plat").alias("lat_a"), "cx", "cy",
        F.explode(offs).alias("o"),
    ).select(
        "id_a", "lon_a", "lat_a",
        ((F.col("cx") + F.col("o.dx")) * _PACK + F.col("cy") + F.col("o.dy"))
        .alias("cell"),
    )
    mm = haversine_mm(
        F.col("lon_a"), F.col("lat_a"), F.col("lon_b"), F.col("lat_b")
    )
    return (
        probe.join(keyed, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("geo_mm", mm)
        .filter(F.col("geo_mm") <= F.lit(int(radius_m) * 1000))
        .select("id_a", "id_b", "geo_mm")
    )
