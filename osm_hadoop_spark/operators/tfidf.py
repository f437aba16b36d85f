"""Corpus-relative term weighting (BM25-style TF-IDF) — pure JVM plan.

Ranks each document's terms by a BM25-shaped score (tf saturation +
document-length normalization + inverse document frequency) and keeps the
top k per document — the standard relevance/keyword-extraction primitive
a training-data pipeline uses for corpus profiling, near-topic filtering,
and quality heuristics. The reference has no text operators (SURVEY
section 2.6); this extends operators/textstats.py with the one family
that needs corpus-global statistics.

Score (k1 = 1.2, b = 0.75, written with rational constants):

    idf(t)      = (N + 1) / (df_t + 0.5)
    satur(t, d) = tf * 2.2 / (tf + 0.3 + 0.9 * dl * N / total_tokens)
    score       = satur * idf

This is BM25 with the conventional `ln` dropped from the idf: every
remaining operation is IEEE-754 +,*,/ (each correctly rounded), so the
score is BIT-EXACT across engines when the expression shape matches —
which makes the DuckDB oracle a value oracle, not an approximate one.
`ln` is not correctly-rounded-guaranteed across libm implementations;
restoring the standard log form is a one-expression change and does not
alter any plan shape. (Precedent: the engine's cosine scores are
cross-engine bit-exact the same way, operators/similarity.py.)

Plan shape (scales to a 100 TB corpus):
  1. tokenize (lower + regex split, JVM codegen) and explode,
  2. tf:  groupBy(doc, term).count  — partial agg before the shuffle,
  3. dl:  tf re-agg by doc          — slim (doc, dl) rows,
  4. df:  tf re-agg by term         — PARTIAL-AGG, deliberately not a
     term-partitioned window: stopword terms are the skew of this
     workload and a window would put one stopword's whole corpus in one
     task, while a hash agg combines map-side,
  5. scalars (N, total_tokens) as a 1-row broadcast cross join,
  6. score + per-doc top-k window (partition key = doc — bounded groups).

Everything after the explode is slim (doc_id, term, counts); no Python,
no UDF, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["term_frequencies", "bm25_topk_terms"]

# lowercase alpha runs; everything else is a separator (same regex class
# semantics in Java regex and RE2, so the DuckDB twin tokenizes equally)
TOKEN_SPLIT_RE = "[^a-z]+"


def term_frequencies(docs: DataFrame, text: str = "text", doc_id: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf) over lowercased alpha tokens — partial-agg shuffle."""
    return (
        docs.select(
            F.col(doc_id).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text)), TOKEN_SPLIT_RE)).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def bm25_topk_terms(
    docs: DataFrame, k: int = 3, text: str = "text", doc_id: str = "doc_id"
) -> DataFrame:
    """Top-k terms per document by the ln-free BM25 score (module docstring).

    Returns (doc_id, term, tf, df, score, rank) with rank in 1..k ordered
    by (score desc, term asc) — the term tiebreak makes the row set
    deterministic under equal scores.
    """
    tf = term_frequencies(docs, text=text, doc_id=doc_id)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    scalars = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("total_tokens"),
    )
    # df joins BROADCAST: shuffling tf by term would put every document
    # containing a stopword into that term's partition (the skew of this
    # workload); the vocab relation is |distinct terms| rows — small next
    # to the corpus. If vocab outgrows broadcast at extreme scale, fall
    # back to a shuffle join and let AQE's skew-join split the hot keys.
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "score",
            (
                F.col("tf").cast("double") * F.lit(2.2)
                / (
                    F.col("tf").cast("double")
                    + F.lit(0.3)
                    + F.lit(0.9) * F.col("dl").cast("double") * F.col("n_docs")
                    / F.col("total_tokens")
                )
            )
            * ((F.col("n_docs") + F.lit(1.0)) / (F.col("df").cast("double") + F.lit(0.5))),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )
