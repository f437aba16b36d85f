"""Kaplan-Meier lifetable ingredients — exact survival/churn analysis.

retention_cohorts (timeseries.py) counts who RETURNS per period; the
survival view asks the censoring-aware question — of those still AT
RISK at time t, what fraction churn — and the Kaplan-Meier estimator
S(t) = Π_{t_i <= t} (1 - d_i / n_i) is its standard nonparametric
form.  The product of fractions has no bounded exact representation,
so this operator emits the exact integer LIFETABLE the estimator (and
Greenwood variance, log-rank tests between keys) is assembled from:

    per key and distinct exit time t:
        n_risk  subjects with start <= t AND end >= t
        d       exits at t with observed = true  (the event: churn)
        c       exits at t with observed = false (right-censored)

n_risk comes from ONE union-sentinel running sum per key (the
scheduling/allen/dominance trick): starts carry +1, ends carry -1,
queries sit at each distinct exit time; the tie order (start, query,
end) at equal position makes start <= t inclusive and end < t strict —
exactly the at-risk convention (subjects exiting AT t count as at
risk at t).  d and c are one hash aggregate.

Contract: start <= end required (violators dropped); one row per
subject.  Returns (key, t, n_risk, d, c) ordered semantics-free.

100 TB posture: slim 4-column union, one window sort per key, one
aggregate — the islands posture; per-key volume is subject count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def km_lifetable(
    subjects: DataFrame,
    key: str = "key",
    start: str = "start",
    end: str = "end",
    observed: str = "observed",
) -> DataFrame:
    """subjects(key, start, end, observed bool) -> per-(key, exit time)
    exact lifetable (key, t, n_risk, d, c)."""
    s = subjects.select(
        F.col(key).alias("key"),
        F.col(start).cast("bigint").alias("s"),
        F.col(end).cast("bigint").alias("e"),
        F.col(observed).cast("boolean").alias("obs"),
    ).filter(F.col("s") <= F.col("e"))

    exits = s.groupBy("key", F.col("e").alias("t")).agg(
        F.sum(F.when(F.col("obs"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("obs"), 0).otherwise(1)).cast("long").alias("c"),
    )

    starts = s.select(
        "key", F.col("s").alias("pos"), F.lit(0).alias("typ"),
        F.lit(1).cast("bigint").alias("w"),
        F.lit(None).cast("bigint").alias("qt"),
    )
    ends = s.select(
        "key", F.col("e").alias("pos"), F.lit(2).alias("typ"),
        F.lit(-1).cast("bigint").alias("w"),
        F.lit(None).cast("bigint").alias("qt"),
    )
    queries = exits.select(
        "key", F.col("t").alias("pos"), F.lit(1).alias("typ"),
        F.lit(0).cast("bigint").alias("w"), F.col("t").alias("qt"),
    )
    w_run = (
        Window.partitionBy("key")
        .orderBy("pos", "typ")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = (
        starts.unionByName(ends).unionByName(queries)
        .withColumn("nr", F.sum("w").over(w_run))
        .filter(F.col("qt").isNotNull())
        .select("key", F.col("qt").alias("t"), F.col("nr").alias("n_risk"))
    )
    return risk.join(exits, ["key", "t"]).select(
        "key", "t", F.col("n_risk").cast("long").alias("n_risk"), "d", "c"
    )
