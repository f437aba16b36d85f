"""Per-key Haar wavelet energy decomposition — unnormalized integer
transform over dyadic window-pairing rounds.

The signal-processing member of the per-key analytics family
(acf_stats measures self-similarity at LAGS; cusum finds one change
point; this separates a series' variation BY SCALE — which levels hold
the energy is the classic cheap fingerprint for spiky-vs-drifting
series, and detail coefficients are the standard change/anomaly
feature).  The unnormalized Haar step on adjacent pairs

    approx = a + b          detail = a - b

keeps everything int64 (the usual 1/sqrt(2) factor is a presentation
scalar: true_detail_energy(level) = energy(level) / 2^level), so the
decomposition is engine-exact.

Input contract: each key's series is its first 2^levels bins in t
order (rank-truncated; shorter series stop early and simply emit
nothing for levels their length cannot fill — a partial pair at any
level is dropped, pinned in tests).  Rounds reuse the MRL/vw window
discipline: each level is ONE lead-over-(key, t-rank) projection that
keeps even ranks — partitioning and ordering stay satisfied, so the
whole level stack plans a single exchange+sort.

Returns (key, level, n_pairs, energy, abs_sum): level 1 is the finest
detail; energy = Σ detail², abs_sum = Σ |detail| (both exact).

100 TB posture: volume halves per level; the only shuffle is the
initial hash by key; per-key series length is bounded by 2^levels,
independent of raw event volume when fed from a (key, bin) aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def haar_energy(
    series: DataFrame,
    levels: int,
    key: str = "key",
    t: str = "t",
    v: str = "v",
) -> DataFrame:
    """series(key, t, v) -> per-(key, level) detail energy, levels in
    [1, 20]."""
    if not 1 <= levels <= 20:
        raise ValueError("levels must be in [1, 20]")
    w = Window.partitionBy("key").orderBy("t")
    cur = (
        series.select(
            F.col(key).alias("key"),
            F.col(t).cast("bigint").alias("t"),
            F.col(v).cast("bigint").alias("v"),
        )
        .withColumn("rk", F.row_number().over(w) - 1)
        .filter(F.col("rk") < F.lit(1 << levels))
        .select("key", F.col("rk").alias("t"), "v")
    )
    outs = []
    for lvl in range(1, levels + 1):
        r = cur.select(
            "key", "t", "v",
            F.lead("v").over(w).alias("nv"),
        ).filter((F.col("t") % 2 == 0) & F.col("nv").isNotNull())
        det = F.col("v") - F.col("nv")
        outs.append(
            r.groupBy("key").agg(
                F.lit(lvl).cast("bigint").alias("level"),
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.sum(det * det).cast("long").alias("energy"),
                F.sum(F.abs(det)).cast("long").alias("abs_sum"),
            )
        )
        cur = r.select(
            "key",
            F.expr("t DIV 2").alias("t"),
            (F.col("v") + F.col("nv")).alias("v"),
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select("key", "level", "n_pairs", "energy", "abs_sum")


def haar_energy_sql(src: str, levels: int) -> str:
    """DuckDB twin over `src`(key, t, v): nests the identical pairing
    fragment per level and unions the per-level censuses."""
    ctes = [
        f"""h0 AS (
  SELECT key, CAST(rk AS BIGINT) AS t, v FROM (
    SELECT key, v, row_number() OVER (PARTITION BY key ORDER BY t) - 1 AS rk
    FROM {src})
  WHERE rk < {1 << int(levels)})"""
    ]
    sels = []
    for lvl in range(1, int(levels) + 1):
        ctes.append(
            f"""p{lvl} AS (
  SELECT key, t, v, nv FROM (
    SELECT key, t, v, lead(v) OVER (PARTITION BY key ORDER BY t) AS nv
    FROM h{lvl - 1})
  WHERE t % 2 = 0 AND nv IS NOT NULL),
h{lvl} AS (SELECT key, t // 2 AS t, v + nv AS v FROM p{lvl})"""
        )
        sels.append(
            f"""SELECT key, CAST({lvl} AS BIGINT) AS level,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum((v - nv) * (v - nv)) AS BIGINT) AS energy,
       CAST(sum(abs(v - nv)) AS BIGINT) AS abs_sum
FROM p{lvl} GROUP BY key"""
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sels)
