"""Maximum non-overlapping interval selection (activity selection) —
the sequential greedy chain, distributed exactly via successor
pointer-doubling.

T-family companion to gaps-and-islands (operators/islands.py): islands
MERGES overlaps into coverage spans; this SELECTS the maximum-size
subset of pairwise non-overlapping intervals per key — meeting-room
scheduling, conflict-free booking, non-overlapping span extraction for
training data (pick the most PII/quote spans that never nest, the dual
of split_pii_spans' cutting).  The classic optimal algorithm is greedy
by earliest end: take the interval with the smallest end, drop everyone
overlapping it, repeat — a data-dependent chain of up to n sequential
steps, the same shape this engine already distributes for suffix ranks
and SCC (doubling) rather than iterating n times.

Exact distributed form, all equi-joins and one sort per key:

  1. SUCCESSOR: nxt(i) = the interval with lexicographically minimal
     (e, s, id) among those with s >= e_i.  One union-sentinel window
     per key (the resample trick): candidate rows carry struct(e,s,id)
     at position s, query rows sit at position e_i; a running `min`
     over (pos DESC, cand-before-query) hands each query exactly the
     minimum candidate with s >= e_i.  Struct min is lexicographic in
     both engines (pinned by test).
  2. HEAD: per key, the globally minimal (e, s, id) — greedy's first
     pick.
  3. ORBIT: selected = {head, nxt(head), nxt^2(head), ...}.  With the
     jump table J_k = nxt^(2^k) (squared once per round by a self
     equi-join), the reachable set R doubles per round:
     R_{k+1} = R_k UNION J_k(R_k) — disjoint by construction (chain
     ends strictly increase), so no distinct is needed.  `rounds`
     bounds the selected-chain length at 2^rounds, the engine's
     bounded-round discipline (cf. scc, suffix, hierarchy).

Correctness of greedy (classic exchange argument) is NOT re-proved
here; the SQL twin replays the identical greedy chain with a recursive
CTE, so the cross-engine check pins the chain itself, and the pytest
brute-force oracle (all subsets, tiny n) pins optimality.

Degenerate inputs: zero/negative-length rows (s >= e) are dropped up
front — under the half-open [s, e) reading an empty interval could be
selected unboundedly many times at one point, so the operator's
contract excludes them (documented, tested).

100 TB posture: every join is an equi-join on (key, id) or (key, j);
the only window sorts each key's rows once per — no, once TOTAL; the
per-round joins touch relations of at most n rows; rounds is
O(log chain) <= 30.  Skewed keys behave like sessionize (one key's
rows colocate) — the window is the bound, not the joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_schedule(
    intervals: DataFrame,
    rounds: int = 20,
    key: str = "key",
    id_col: str = "id",
    s: str = "s",
    e: str = "e",
) -> DataFrame:
    """intervals(key, id, s, e) int64, half-open [s, e), id unique per
    key -> the greedy maximum non-overlapping selection as (key, id, s,
    e).  Chains longer than 2^rounds are truncated (rounds <= 30)."""
    if not 1 <= rounds <= 30:
        raise ValueError("rounds must be in [1, 30]")
    iv = intervals.select(
        F.col(key).alias("key"),
        F.col(id_col).cast("bigint").alias("id"),
        F.col(s).cast("bigint").alias("s"),
        F.col(e).cast("bigint").alias("e"),
    ).filter(F.col("s") < F.col("e"))

    cand = iv.select(
        "key",
        F.col("s").alias("pos"),
        F.lit(0).alias("ord"),
        F.struct("e", "s", "id").alias("cand"),
        F.lit(None).cast("bigint").alias("qid"),
    )
    qry = iv.select(
        "key",
        F.col("e").alias("pos"),
        F.lit(1).alias("ord"),
        F.lit(None).cast("struct<e:bigint,s:bigint,id:bigint>").alias("cand"),
        F.col("id").alias("qid"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy(F.desc("pos"), F.asc("ord"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = (
        cand.unionByName(qry)
        .withColumn("m", F.min("cand").over(w))
        .filter(F.col("qid").isNotNull())
        .select("key", F.col("qid").alias("id"), F.col("m.id").alias("j"))
    )

    head = (
        iv.groupBy("key")
        .agg(F.min(F.struct("e", "s", "id")).alias("h"))
        .select("key", F.col("h.id").alias("id"))
    )

    reach = head
    jump = nxt.localCheckpoint(eager=True)  # lineage truncation (cc.py idiom)
    for r in range(rounds):
        stepped = (
            reach.join(jump, ["key", "id"])
            .filter(F.col("j").isNotNull())
            .select("key", F.col("j").alias("id"))
        )
        reach = reach.unionByName(stepped).localCheckpoint(eager=True)
        if r + 1 == rounds:
            break  # last round's jump table is never used
        a, b = jump.alias("a"), jump.alias("b")
        jump = (
            a.join(
                b,
                (F.col("a.key") == F.col("b.key"))
                & (F.col("a.j") == F.col("b.id")),
                "left",
            )
            .select(F.col("a.key").alias("key"), F.col("a.id").alias("id"),
                    F.col("b.j").alias("j"))
            .localCheckpoint(eager=True)
        )

    return reach.join(iv, ["key", "id"]).select("key", "id", "s", "e")


def interval_schedule_sql(src: str) -> str:
    """DuckDB twin over `src`(key, id, s, e): the greedy chain replayed
    literally with a recursive CTE + LATERAL min-pick — opposite
    mechanism (sequential walk vs pointer doubling), identical rows."""
    return f"""
WITH RECURSIVE iv AS (
  SELECT key, id, s, e FROM {src} WHERE s < e
), sel AS (
  SELECT key, id, s, e FROM (
    SELECT key, id, s, e,
           row_number() OVER (PARTITION BY key ORDER BY e, s, id) AS rn
    FROM iv) WHERE rn = 1
  UNION ALL
  SELECT nx.key, nx.id, nx.s, nx.e
  FROM sel JOIN LATERAL (
    SELECT key, id, s, e FROM iv
    WHERE iv.key = sel.key AND iv.s >= sel.e
    ORDER BY e, s, id LIMIT 1) nx ON true
)
SELECT key, id, s, e FROM sel
"""
