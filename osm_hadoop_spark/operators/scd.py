"""SCD2 dimension build: change log -> validity-interval versions.

The warehouse half of the temporal family. `asof.py` answers "which
version was live at time t" given versioned rows; THIS operator
produces those versioned rows from a raw change log — the standard
slowly-changing-dimension type-2 build every Iceberg/lakehouse
pipeline runs on entity snapshots (and the relational analog of the
reference's changeset application, `diff.py::apply_osc`, which keeps
only the LATEST state; SCD2 keeps them all with validity windows).

Semantics:
  per key, changes ordered by (ts, seq):
    1. collapse no-op changes — a row opens a new version iff ANY
       tracked attribute differs (null-safely) from the previous row's;
    2. each surviving row is a version valid [its ts, next survivor's
       ts); the last version's valid_to is NULL ("current").

Plan: ONE Exchange + ONE Sort. The lag comparison (step 1) and the
lead after the filter (step 2) share the same (key, ts, seq) ordering,
and Filter preserves child partitioning/ordering, so Catalyst plans
the second Window with no additional exchange or sort.

100 TB posture: shuffle key is the entity key; both windows are O(1)
state per row; no-op collapse happens BEFORE anything is materialized
downstream, so heavily-polled-but-rarely-changing entities (the common
skew in change logs) shrink at their first aggregation. Per-key row
counts bound the window task; salt upstream if one entity's change
history is unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    seq: str,
) -> DataFrame:
    """DataFrame(key, *attrs, valid_from, valid_to, version, is_current).

    `version` is 0-based per key in time order over SURVIVING (non-no-op)
    changes; `valid_to` is NULL on each key's current version."""
    w = Window.partitionBy(key).orderBy(ts, seq)
    with_prev = changes.select(
        key, ts, seq, *attrs,
        *[F.lag(F.col(a)).over(w).alias(f"_p_{a}") for a in attrs],
        F.row_number().over(w).alias("_rn"),
    )
    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(a).eqNullSafe(F.col(f"_p_{a}"))
    survivors = with_prev.where((F.col("_rn") == 1) | differs)
    w2 = Window.partitionBy(key).orderBy(ts, seq)
    return survivors.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(F.col(ts)).over(w2).alias("valid_to"),
        (F.row_number().over(w2) - 1).cast("bigint").alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())
