"""Edit-distance self-join with COMPLETE recall: PassJoin segment blocking.

Record linkage / fuzzy dedup primitive (LLM-pipeline family: near-dup
titles, OCR variants, user-agent strings). The naive form is a quadratic
levenshtein cross product; the scalable form blocks candidates so that
NO true pair is lost, then verifies survivors exactly.

Blocking scheme (PassJoin — Li, Deng, Feng: "PASS-JOIN: a partition
based method for similarity joins", PVLDB 2011; public algorithm,
re-derived here): partition every indexed string s of length l into
k + 1 contiguous segments (even split: base = l div (k+1), the LAST
l mod (k+1) segments one char longer). If ed(s, t) <= k, then by
pigeonhole at least one segment of s is untouched by all k edits and
therefore occurs VERBATIM in t, shifted from its home position by at
most k (each edit before it shifts it by at most one). So the probe side
enumerates, for every candidate indexed length l in [len(t)-k, len(t)+k]
and every segment index i, the substrings of t with the segment's exact
length at every start within +-k of the segment's home position — a
FIXED (2k+1)(k+1)(2k+1) literal grid per probe row (45 at k=2) — and
candidates are ONE equi-join on (l, i, segment_text). Agreement with the
blocking-free quadratic oracle is therefore a proof of complete recall,
not a recall estimate.

Cost at 100 TB: the join is a plain hash equi-join on slim
(length, idx, short-substring) keys; row amplification is the constant
45x on the probe side and (k+1)x on the indexed side; hot segments (a
ubiquitous token) are ordinary join skew — AQE skew-join splits them,
and the verify is JVM `levenshtein` (whole-stage codegen), applied once
per DISTINCT candidate pair (dropDuplicates before verify). No Python
anywhere.

Strings shorter than k + 1 chars are excluded (a k+1-way partition of
them has empty segments, which would match everything); callers gate or
pad — the driver derivation guarantees length >= 8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_selfjoin(
    strings: DataFrame, k: int = 2, id_col: str = "sid", s_col: str = "s"
) -> DataFrame:
    """All unordered pairs (a_id < b_id) with levenshtein <= k.

    strings: (id_col, s_col) — ids unique, strings len >= k + 1.
    Returns (a_id, b_id, dist) exact, complete, each pair once.
    """
    kk = k + 1
    df = strings.select(
        F.col(id_col).alias("sid"),
        F.col(s_col).alias("s"),
        F.length(s_col).cast("long").alias("m"),
    ).filter(F.col("m") >= kk)

    # indexed role: own k+1 segments (i, home start, width) of length m
    seg_struct = f"""transform(sequence(0, {k}), i -> struct(
        i AS i,
        i * (m DIV {kk}) + greatest(0, i - ({kk} - m % {kk})) AS p,
        (m DIV {kk}) + (CASE WHEN i >= {kk} - m % {kk} THEN 1 ELSE 0 END) AS w))"""
    indexed = df.select(
        F.col("sid").alias("a_id"),
        F.col("s").alias("s_a"),
        F.col("m").alias("l"),
        F.explode(F.expr(seg_struct)).alias("g"),
    ).select(
        "a_id",
        "s_a",
        "l",
        F.col("g.i").alias("i"),
        F.expr("substr(s_a, CAST(g.p + 1 AS INT), CAST(g.w AS INT))").alias("seg"),
    )

    # probe role: the literal (dl, i, shift) grid; l = m + dl is the
    # candidate indexed length whose segmentation is re-derived here
    grid = F.array(
        *[
            F.struct(
                F.lit(dl).cast("long").alias("dl"),
                F.lit(i).cast("long").alias("i"),
                F.lit(dd).cast("long").alias("dd"),
            )
            for dl in range(-k, k + 1)
            for i in range(kk)
            for dd in range(-k, k + 1)
        ]
    )
    probe = (
        df.select("sid", "s", "m", F.explode(grid).alias("c"))
        .select(
            F.col("sid").alias("b_id"),
            F.col("s").alias("s_b"),
            "m",
            (F.col("m") + F.col("c.dl")).alias("l"),
            F.col("c.i").alias("i"),
            F.col("c.dd").alias("dd"),
        )
        .filter(F.col("l") >= kk)
        .withColumn("_base", F.expr(f"l DIV {kk}"))
        .withColumn("_rem", F.expr(f"l % {kk}"))
        .withColumn(
            "_p", F.expr(f"i * _base + greatest(0, i - ({kk} - _rem))")
        )
        .withColumn(
            "_w", F.expr(f"_base + (CASE WHEN i >= {kk} - _rem THEN 1 ELSE 0 END)")
        )
        .withColumn("_st", F.col("_p") + F.col("dd"))
        .filter(
            (F.col("_w") >= 1)
            & (F.col("_st") >= 0)
            & (F.col("_st") + F.col("_w") <= F.col("m"))
        )
        .select(
            "b_id",
            "s_b",
            "l",
            "i",
            F.expr("substr(s_b, CAST(_st + 1 AS INT), CAST(_w AS INT))").alias(
                "seg"
            ),
        )
    )

    cand = (
        indexed.join(probe, ["l", "i", "seg"])
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    return cand.select(
        "a_id",
        "b_id",
        F.levenshtein("s_a", "s_b").cast("long").alias("dist"),
    ).filter(F.col("dist") <= k)
