"""Incremental view maintenance: merge a CDC delta into an aggregate.

The 100 TB pattern this encodes: a materialized aggregate (the "view")
over a petabyte base table must absorb a day's inserts/deletes WITHOUT
rescanning the base — the classic delta rule for distributive aggregates
(Gupta & Mumick's IVM framework; what Materialize/Flink retraction
streams and Delta Live Tables do under the hood). COUNT and SUM are
self-maintainable: view' = view ⊎ agg(delta) with deletes as negative
multiplicities.

    merged(k) = (cnt_view(k) + cnt_delta(k), sum_view(k) + sum_delta(k))
    where delta aggregates op * 1 and op * measure, op ∈ {+1, -1};
    groups reaching cnt = 0 are dropped (their sum is provably 0 for a
    consistent delta stream — asserted optionally via `check_zero`).

Exactness: counts and integer measures only (a float SUM would make the
incremental and from-scratch answers differ by summation order — the
repo-wide integer discipline). The correctness statement is the IVM
IDENTITY itself: the registry oracle computes the same view FROM SCRATCH
over (base - deletes + inserts); equality proves the merge, not just
reproduces it.

Plan: agg(delta) is one partial-aggregatable groupBy over ONLY the delta
(the whole point — base is never read); the merge is a full-outer
equi-join on the group key, hash-partitioned both sides. At scale the
view is bucketed by the key (sources/catalog.py bucketed snapshots), so
the join co-locates and the delta batch is the only shuffled data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ivm_delta_agg(delta: DataFrame, key: str, measure: str, op: str = "op") -> DataFrame:
    """Aggregate a CDC batch into per-key (d_cnt, d_sum) with signed
    multiplicities. op must be +1 (insert) or -1 (delete)."""
    return delta.groupBy(key).agg(
        F.sum(F.col(op)).cast("bigint").alias("d_cnt"),
        F.sum(F.col(op) * F.col(measure)).cast("bigint").alias("d_sum"),
    )


def ivm_merge(
    view: DataFrame,
    delta: DataFrame,
    key: str,
    measure: str,
    op: str = "op",
    check_zero: bool = False,
) -> DataFrame:
    """view(key, cnt, sm) + delta(key, measure, op) -> updated view.

    Full-outer merge of the existing aggregate with the delta aggregate;
    zero-count groups drop. With check_zero=True a dropped group with a
    non-zero residual sum raises at action time (inconsistent delta —
    a delete whose measure doesn't match what was inserted)."""
    d = ivm_delta_agg(delta, key, measure, op)
    merged = (
        view.join(d, key, "full_outer")
        .select(
            key,
            (F.coalesce(F.col("cnt"), F.lit(0))
             + F.coalesce(F.col("d_cnt"), F.lit(0))).alias("cnt"),
            (F.coalesce(F.col("sm"), F.lit(0))
             + F.coalesce(F.col("d_sum"), F.lit(0))).alias("sm"),
        )
    )
    if check_zero:
        bad = merged.filter((F.col("cnt") == 0) & (F.col("sm") != 0))
        assert bad.limit(1).count() == 0, "ivm: zero-count group with residual sum"
    return merged.filter(F.col("cnt") > 0)
