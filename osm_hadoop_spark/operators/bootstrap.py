"""Streaming bootstrap replicates: resampled aggregates in one pass.

The Poisson-bootstrap pattern (Chamandy et al., "Estimating Uncertainty
for Massive Data Streams", Google 2012): instead of resampling n rows
with replacement B times (impossible at 100 TB — it needs n known and B
full passes), give every row an independent per-replica replicate
WEIGHT with mean 1 and fold all B replica aggregates in ONE pass; the
spread of the replica statistics estimates the sampling uncertainty of
the true aggregate.

Determinism + integer exactness: the classic draw is Poisson(1), whose
inverse CDF needs e — irrational, banned by the repo's oracle
discipline. Binomial(4, 1/4) has the same mean, close variance (3/4 vs
1), and is EXACTLY computable from hash bits: one h60 per (row,
replica) supplies four independent base-4 digits, each a success with
probability 1/4. The oracle reproduces every weight bit-for-bit.

Plan: a bounded B-way sequence explode (the replica axis), one hash
per exploded row, ONE partial-aggregatable hash aggregate on the
replica id — B groups, map-side combined, no shuffle of note, no join.
The textbook sketch shape: per-partition state is B running (count,
sum) pairs merged associatively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


def _binom4_weight(h: Column) -> Column:
    """Four independent P=1/4 trials from one 60-bit hash: success = the
    j-th base-4 digit equals 0."""
    w = F.lit(0)
    for j in range(4):
        w = w + ((h.bitwiseAND(F.lit(3 << (2 * j)))) == 0).cast("int")
    return w


def poisson_bootstrap(
    rows: DataFrame, id_col: str, value: str, replicas: int = 16,
) -> DataFrame:
    """(replica, n_eff, sum_v): per bootstrap replica, the reweighted
    row count and value sum — exact int64. The consumer reads the
    across-replica spread as the uncertainty of (count, sum/mean)."""
    d = rows.select(
        F.col(id_col).cast("string").alias("rid"),
        F.col(value).cast("bigint").alias("v"),
    ).withColumn(
        "replica",
        F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))),
    )
    h = h60(
        F.concat(F.lit("bs"), F.col("replica").cast("string"),
                 F.lit("_"), F.col("rid"))
    )
    d = d.withColumn("w", _binom4_weight(h).cast("bigint"))
    return d.groupBy("replica").agg(
        F.sum("w").cast("bigint").alias("n_eff"),
        F.sum(F.col("w") * F.col("v")).cast("bigint").alias("sum_v"),
    )
