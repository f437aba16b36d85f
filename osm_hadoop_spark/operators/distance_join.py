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
