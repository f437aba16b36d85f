"""S2 containment join: leaf-indexed points vs a mixed-level cell set.

Completes the S2 index story (functions/s2.py): assignment gives every
point a leaf id; this operator joins points to an arbitrary set of
REGION cells (any mix of levels) by hierarchical containment — the S2
analog of the reference's way×tile join filter stage, with containment
expressed purely on the id encoding (a cell's descendants form one
contiguous id interval: range_min/range_max).

Two physical strategies, same semantics (tests assert equality):

  - strategy="broadcast": broadcast the region table and join on
    leaf BETWEEN range_min AND range_max. Right when regions fit in a
    broadcast (the common boundary-set case — reference analog: the 39
    region geometries of ImageRegions.scala). BroadcastNestedLoopJoin,
    zero shuffle of the big side.

  - strategy="levels" (default, the 100 TB path): regions at a given
    level L match points on cell_parent(leaf, L) EXACTLY — so group the
    region set by its (at most 31) distinct levels and run one hash
    EQUI-join per level, union the results. Every join is
    shuffle-partitioned on a computable key (broadcastable when the
    per-level slice is small; Catalyst decides), no inequality
    predicates anywhere, AQE-skew-splittable. The distinct-level
    collect is bounded by 31 rows (an allowed bounded collect,
    tests/test_no_slow_path.py whitelist).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_leaf_cell(points: DataFrame, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Append `s2_leaf` (level-30 id) to a lon/lat DataFrame (vectorized)."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(points.schema.fields) + [StructField("s2_leaf", LongType())]
    )

    def assign(batches):
        from osm_hadoop_spark.functions.s2 import cell_for_lonlat

        for b in batches:
            b = b.copy()
            b["s2_leaf"] = cell_for_lonlat(b[lon].to_numpy(), b[lat].to_numpy(), 30)
            yield b

    return points.mapInPandas(assign, schema=schema)


def regions_from_points(
    df: DataFrame, id_col: str, lon: str, lat: str, level_col: str
) -> DataFrame:
    """(id, lon, lat, level) -> (id, region_cell, range_min, range_max)."""

    def build(batches):
        from osm_hadoop_spark.functions.s2 import (
            cell_for_lonlat,
            cell_range_max,
            cell_range_min,
        )

        for b in batches:
            out = pd.DataFrame({"region_id": b[id_col]})
            levels = b[level_col].to_numpy()
            lo = b[lon].to_numpy()
            la = b[lat].to_numpy()
            # vectorize per distinct level (<= 31 groups per batch)
            import numpy as np

            cells = np.empty(len(b), dtype=np.int64)
            for lvl in np.unique(levels):
                m = levels == lvl
                cells[m] = cell_for_lonlat(lo[m], la[m], int(lvl))
            out["region_cell"] = cells
            out["level"] = levels
            out["range_min"] = cell_range_min(cells)
            out["range_max"] = cell_range_max(cells)
            yield out

    return df.mapInPandas(
        build,
        schema="region_id bigint, region_cell bigint, level int, "
        "range_min bigint, range_max bigint",
    )


def s2_containment_join(
    points: DataFrame,
    regions: DataFrame,
    leaf_col: str = "s2_leaf",
    strategy: str = "levels",
) -> DataFrame:
    """Inner-join points to every region cell containing them.

    points: any DataFrame with `leaf_col` (level-30 id).
    regions: (region_id, region_cell, level, range_min, range_max).
    Returns points columns + (region_id, region_cell).
    """
    if strategy == "broadcast":
        return points.join(
            F.broadcast(regions.select("region_id", "region_cell", "range_min", "range_max")),
            (F.col(leaf_col) >= F.col("range_min"))
            & (F.col(leaf_col) <= F.col("range_max")),
        ).drop("range_min", "range_max")

    if strategy != "levels":
        raise ValueError(f"unknown strategy {strategy!r}")

    levels = sorted(r["level"] for r in regions.select("level").distinct().collect())
    # ONE pass over the points: per-level parent ids by pure JVM arithmetic
    # ((id & -lsb) | lsb), exploded in-pipeline (x|levels| slim rows, no
    # rescan of the base), then a single equi-join on (level, cell) —
    # broadcastable when regions are small, shuffle-hash otherwise.
    structs = []
    for lvl in levels:
        lsb = 1 << (2 * (30 - int(lvl)))
        parent = F.col(leaf_col).bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))
        structs.append(
            F.struct(
                F.lit(int(lvl)).alias("level"), parent.alias("region_cell")
            )
        )
    cand = points.withColumn("_lc", F.explode(F.array(*structs))).select(
        *points.columns,
        F.col("_lc.level").alias("level"),
        F.col("_lc.region_cell").alias("region_cell"),
    )
    return cand.join(
        regions.select("region_id", "level", "region_cell"),
        ["level", "region_cell"],
    ).drop("level")
