"""Deterministic mergeable quantile summary — MRL-style pair-merge
compaction, bit-identical across engines.

The sketch member the family was missing: hll.py bounds DISTINCTS,
cm/heavy bound FREQUENCIES, ams bounds F2, kmv bounds OVERLAP — this
bounds RANKS.  exact_quantiles/equi_depth give exact answers with a
full shuffle+sort of every row; at 100 TB the scalable path is a
per-shard bounded summary merged at the top, which is exactly how
Spark's own `approx_percentile` (Greenwald-Khanna) works — but GK (and
KLL's coin flips) are NOT reproducible across engines, so they can
never pass this repo's cross-engine value gate.  This operator is the
deterministic replacement, in the Manku-Rajagopalan-Lindsay collapse
family: every decision is a pure function of the data, so Spark and
DuckDB build THE SAME sketch and the estimates match bit-for-bit.

Construction (hash-sharded, `levels` bounded rounds, all windows
partitioned by shard):

  - row -> shard by id hash; weight 1.
  - round ell (0-based): shards holding <= k items pass through
    untouched; larger shards pair consecutive items by (value, id)
    rank — pair p = rank DIV 2 — and each pair collapses to ONE item:
    the LEFT element on even rounds, the RIGHT on odd rounds
    (alternating offset, MRL's error-cancelling discipline), carrying
    the PAIR'S SUMMED weight.  An unpaired trailing item survives
    unchanged.  Total weight is conserved EXACTLY at every step (the
    kept item absorbs its partner), so sum(w) == n always — pinned in
    tests.
  - estimate: the merged summary (<= shards*k items — a bounded
    relation, so its single ordered window is legitimate, cf.
    ranges.py's coarse window) is scanned by cumulative weight; the
    q-quantile estimate is the first item whose running weight reaches
    ceil(q*n/100).

Error: collapsing a pair whose total weight is w perturbs any rank
query by < w; weights double per round, counts halve, so per shard the
rank error telescopes to O(n_shard / k) and globally to O(n / k) —
asserted empirically in tests (random + sorted-adversarial inputs) at
|rank error| <= n/k + shards.  Choose k ~ 1/eps.

100 TB posture: ONE hash shuffle + per-shard sort total — each round is
a windowed filter+project that preserves the partitioning and the sort,
so every later round's window requirement is already satisfied (plan
shows a single Exchange; the frame also HALVES per round).  The final
relation is broadcast-size.  No global sort of the data ever happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DECILES = tuple(range(10, 100, 10))


def _compact_round(cur: DataFrame, k: int, parity: int) -> DataFrame:
    """One pair-collapse round as a single windowed filter+project: the
    kept element absorbs its partner's weight via lead/lag over the SAME
    (shard, (value, id)) sort — no groupBy, and because the filter
    preserves per-partition order, rounds after the first satisfy the
    window's required partitioning AND ordering already: Catalyst plans
    ONE exchange+sort for the whole level stack (the vw.py discipline)."""
    w_rank = Window.partitionBy("shard").orderBy("value", "id")
    w_cnt = Window.partitionBy("shard")
    rk, cnt, nw = F.col("rk"), F.col("cnt"), F.col("nw")
    r = cur.select(
        "shard", "value", "id", "w",
        (F.row_number().over(w_rank) - 1).alias("rk"),
        F.count(F.lit(1)).over(w_cnt).alias("cnt"),
        F.lead("w").over(w_rank).alias("nw"),
        F.lag("w").over(w_rank).alias("pw"),
    )
    if parity == 0:
        keep_big = rk % 2 == 0
        wnew = F.col("w") + F.coalesce(nw, F.lit(0))
    else:
        keep_big = (rk % 2 == 1) | nw.isNull()
        wnew = F.col("w") + F.when(rk % 2 == 1, F.col("pw")).otherwise(0)
    return r.filter((cnt <= k) | keep_big).select(
        "shard", "value", "id",
        F.when(cnt <= k, F.col("w")).otherwise(wnew).cast("bigint").alias("w"),
    )


def mrl_deciles(
    rows: DataFrame,
    k: int = 64,
    shards: int = 32,
    levels: int = 12,
    value: str = "value",
    id_col: str = "id",
    shard_col: str | None = None,
) -> DataFrame:
    """rows(value int64, id int64 unique) -> (q_pct, est, n) for the
    nine deciles: est = first summary item whose cumulative weight
    reaches ceil(q*n/100).  Deterministic; cross-engine exact.

    Sharding: by default Spark's xxhash64(id) mod shards (fast,
    JVM-side).  xxhash64 has no DuckDB equivalent, so queries that need
    a cross-engine value oracle pass `shard_col` — a shard the caller
    computed with a portable expression (e.g. id % shards) that the SQL
    twin repeats verbatim.  The sketch is correct under ANY shard
    assignment; only reproducibility across engines needs the shared
    definition."""
    if k < 2 or shards < 1 or not 1 <= levels <= 40:
        raise ValueError("need k >= 2, shards >= 1, 1 <= levels <= 40")
    shard = (
        F.col(shard_col).cast("bigint")
        if shard_col
        else F.pmod(F.xxhash64(F.col(id_col).cast("bigint")), F.lit(shards))
    )
    cur = rows.select(
        shard.alias("shard"),
        F.col(value).cast("bigint").alias("value"),
        F.col(id_col).cast("bigint").alias("id"),
        F.lit(1).cast("bigint").alias("w"),
    )
    for ell in range(levels):
        cur = _compact_round(cur, k, ell % 2)

    w_cum = (
        Window.orderBy("value", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    summ = cur.select(
        "value", "id", "w", F.sum("w").over(w_cum).alias("cumw")
    )
    total = rows.groupBy().agg(F.count(F.lit(1)).alias("n"))
    qs = F.explode(F.array(*[F.lit(q) for q in DECILES])).alias("q_pct")
    targets = total.select(qs, "n").select(
        "q_pct",
        "n",
        F.expr("(q_pct * n + 99) DIV 100").alias("tgt"),
    )
    hit = (
        summ.join(F.broadcast(targets), F.col("cumw") >= F.col("tgt"))
        .groupBy("q_pct", "n")
        .agg(F.min(F.struct("value", "id")).alias("first"))
        .select(
            "q_pct",
            F.col("first.value").alias("est"),
            F.col("n").cast("bigint").alias("n"),
        )
    )
    return hit


def mrl_round_sql(src: str, k: int, parity: int) -> str:
    """One compaction round as a DuckDB fragment over CTE `src`
    exposing (shard, value, id, w) — the exact twin of _compact_round."""
    p = int(parity)
    return f"""
  SELECT shard, value, id,
         CAST(CASE WHEN cnt <= {int(k)} THEN w
                   WHEN {p} = 0 THEN w + COALESCE(nw, 0)
                   ELSE w + CASE WHEN rk % 2 = 1 THEN pw ELSE 0 END
              END AS BIGINT) AS w
  FROM (
    SELECT shard, value, id, w,
           row_number() OVER w1 - 1 AS rk,
           count(*) OVER (PARTITION BY shard) AS cnt,
           lead(w) OVER w1 AS nw, lag(w) OVER w1 AS pw
    FROM {src}
    WINDOW w1 AS (PARTITION BY shard ORDER BY value, id))
  WHERE cnt <= {int(k)} OR ({p} = 0 AND rk % 2 = 0)
     OR ({p} = 1 AND (rk % 2 = 1 OR nw IS NULL))
"""


def mrl_deciles_sql_presharded(
    src: str, k: int, levels: int
) -> str:
    """DuckDB twin over `src`(shard, value, id): nests mrl_round_sql
    `levels` times, then the cumulative-weight decile pick.  The shard
    column comes from the caller so both engines use the identical
    sharding function."""
    ctes = [f"c0 AS (SELECT shard, value, id, 1::BIGINT AS w FROM {src})"]
    for ell in range(levels):
        ctes.append(
            f"c{ell + 1} AS ({mrl_round_sql(f'c{ell}', k, ell % 2)})"
        )
    last = f"c{levels}"
    qlist = ", ".join(str(q) for q in DECILES)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
summ AS (
  SELECT value, id, w,
         sum(w) OVER (ORDER BY value, id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumw
  FROM {last}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {src}),
tgt AS (
  SELECT q_pct, n, (q_pct * n + 99) // 100 AS tgt
  FROM (SELECT unnest([{qlist}]) AS q_pct), tot)
SELECT t.q_pct,
       (min(struct_pack(value := s.value, id := s.id))).value AS est,
       CAST(t.n AS BIGINT) AS n
FROM tgt t JOIN summ s ON s.cumw >= t.tgt
GROUP BY t.q_pct, t.n
"""
    )
