"""Changeset application: merge an OSM-style diff into a snapshot.

The reference's osmosis template data carries versioned, deletable
entities (db-changeset-expected.osm — every element has `version=`, and a
changeset replaces lower versions / removes deleted ones); the reference
jobs themselves only ever consume a finished snapshot. For a planet-scale
engine the incremental path is table stakes — reprocessing 100 TB for a
daily diff is the thing this operator avoids.

Semantics (osmosis snapshot rules):
  - for each entity id, the HIGHEST version wins across base ∪ delta;
  - on a version tie the delta row wins (re-applying a diff is idempotent);
  - a winning row with visible=false is a delete: dropped from the output.

Spark shape: one union (no shuffle) + one window on entity id (single hash
shuffle — same budget as any merge). On an Iceberg deployment the same
semantics map to MERGE INTO; this operator is the engine-native form that
also works on the parquet snapshot catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_diff(
    base: DataFrame,
    delta: DataFrame,
    id_col: str = "entity_id",
    version_col: str = "version",
    visible_col: str = "visible",
) -> DataFrame:
    """base ∪ delta -> next snapshot (latest visible version per entity).

    Both inputs need (id_col, version_col, visible_col, payload...); the
    schemas must match (unionByName). Output keeps every column except the
    visibility flag's losers — deleted entities vanish entirely.
    """
    clash = {"_src", "_rn"} & (set(base.columns) | set(delta.columns))
    if clash:
        raise ValueError(
            f"apply_diff reserves column names {sorted(clash)}; rename them"
        )
    u = base.withColumn("_src", F.lit(0)).unionByName(
        delta.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col(version_col).desc(), F.col("_src").desc()
    )
    latest = (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    return latest.filter(F.col(visible_col))


def derive_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "entity_id",
    version_col: str = "version",
    payload_cols: list | None = None,
) -> DataFrame:
    """Two snapshots -> the MINIMAL changeset: the osmosis derive-change
    inverse of apply_diff, pinned by the round-trip contract

        apply_diff(old + visible=true, derive_diff(old, new)) == new

    (asserted in tests).  Rules, per entity id:
      - create: id only in new        -> new row, visible = true
      - modify: id in both, any of (version, payload...) differs
                                      -> new row, visible = true
      - delete: id only in old        -> old payload, version + 1,
                                         visible = false
      - unchanged rows are NOT emitted (the diff is minimal).

    Requires new.version >= old.version per shared id (snapshots move
    forward); with that, apply_diff's highest-version/delta-wins rules
    reproduce `new` exactly even when a modify keeps its version.
    Comparison is null-safe on every payload column.

    Plan: one full-outer hash join on the entity id (the only shuffle)
    + a codegen CASE — the symmetric twin of apply_diff's one-window
    merge.  100 TB posture: both sides shuffle once on the id; skewless
    by construction (ids are unique per side).
    """
    if payload_cols is None:
        payload_cols = [
            c for c in new.columns if c not in (id_col, version_col)
        ]
    o = old.select(
        F.col(id_col).alias("_oid"), F.col(version_col).alias("_over"),
        *[F.col(c).alias(f"_o_{c}") for c in payload_cols],
    )
    n = new.select(
        F.col(id_col).alias("_nid"), F.col(version_col).alias("_nver"),
        *[F.col(c).alias(f"_n_{c}") for c in payload_cols],
    )
    j = o.join(n, o["_oid"] == n["_nid"], "full_outer")
    same = F.col("_over").eqNullSafe(F.col("_nver"))
    for c in payload_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    is_create = F.col("_oid").isNull()
    is_delete = F.col("_nid").isNull()
    keep = is_create | is_delete | ~same
    return j.filter(keep).select(
        F.coalesce("_nid", "_oid").alias(id_col),
        F.when(is_delete, F.col("_over") + 1)
        .otherwise(F.col("_nver")).alias(version_col),
        (~is_delete).alias("visible"),
        *[
            F.when(is_delete, F.col(f"_o_{c}"))
            .otherwise(F.col(f"_n_{c}")).alias(c)
            for c in payload_cols
        ],
    )
