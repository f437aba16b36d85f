"""AMS second-moment (F2) sketch next to its exact twin.

F2 = sum over keys of count(key)^2 — the self-join size / repeat rate of
a stream, the quantity that prices every equi-join before you run it.
Exact F2 needs a full groupBy; the Alon-Matias-Szegedy sketch gets an
unbiased estimate from k sign-hash counters that fold in ONE pass with
plain partial-aggregatable sums — the memory-bounded path at 100 TB.

Determinism: the sign draws use the repo's shared h60 hash per
(counter j, key), so the sketch is replayable and the DuckDB twin
reproduces every counter bit-for-bit — the oracle checks BOTH the exact
F2 and the full sketch estimate, not just the exact side.

Estimator: per counter j, Z_j = sum over rows of sign_j(key); E[Z_j^2]
= F2 under 4-wise independence. The output reports mean-of-squares as
the exact integer pair (sum of Z_j^2, k) — no float division, the
consumer divides. Accuracy (relative error shrinking with k) is pinned
by property test, not by the oracle.

Plan: one projection computing k signs per row (a bounded literal-range
explode keeps the expression tree linear in k instead of k columns wide
— k columns of md5 would also work but bloats codegen), then ONE hash
aggregate; no join, no shuffle beyond the k-row-per-input aggregate
exchange. At 100 TB this is the textbook sketch shape: state is k
integers per partition, merged associatively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


def ams_f2(rows: DataFrame, key: str, k: int = 32) -> DataFrame:
    """One row: (f2_exact, sq_sum, k) where sq_sum/k estimates f2_exact.

    f2_exact comes from the groupBy twin (count^2 summed); sq_sum is the
    sum over the k AMS counters of Z_j^2, each Z_j = sum of h60-derived
    +/-1 signs.
    """
    keyed = rows.select(F.col(key).cast("string").alias("kv"))
    signs = keyed.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
        "kv",
    ).select(
        "j",
        (
            (h60(F.concat(F.lit("ams"), F.col("j").cast("string"),
                          F.lit("_"), F.col("kv"))) % 2) * 2 - 1
        ).alias("sgn"),
    )
    z = signs.groupBy("j").agg(F.sum("sgn").cast("bigint").alias("zj"))
    sketch = z.agg(
        F.sum(F.col("zj") * F.col("zj")).cast("bigint").alias("sq_sum"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    exact = keyed.groupBy("kv").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2_exact"))
    return exact.join(F.broadcast(sketch))
