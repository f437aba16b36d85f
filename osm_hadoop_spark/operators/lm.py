"""Corpus bigram language-model quality scoring (the CCNet-style LM gate).

Production corpus curation scores each document with a small LM and
drops the tails (CCNet / Gopher both gate on LM perplexity).  This
operator is the distributable integer form: train the bigram MLE on the
corpus itself (one pass), then score every document by how predictable
its bigrams are under that model.

    p(w2 | w1)        = c(w1 w2) / c(w1 ·)          (MLE, prefix counts)
    term(w1 w2)       = floor(SCALE * c(w1 w2) / c(w1 ·))   (integer DIV)
    lm_score(doc)     = sum of term over the doc's bigrams
    lm_q(doc)         = floor(lm_score / n_bigrams)  (per-bigram average)

SCALE-quantized integer terms make the score a deterministic bigint —
the cross-engine twin is exact, and the ranking is the same monotone
transform of mean log-ish predictability a float LM gate would use
(floor quantization is monotone per term).

Plan: tokens -> bigram explode -> TWO count aggregates (bigram, prefix)
-> two equi-joins back on slim string keys -> one per-doc sum.  The
count relations are corpus-vocabulary-sized, so the joins shuffle only
(key, count) pairs; nothing is ever collected.  At 100 TB the bigram
count table is the classic word-count shape — partial aggregation does
the heavy lifting map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col

SCALE = 1 << 20


def bigram_lm_scores(documents: DataFrame, scale: int = SCALE) -> DataFrame:
    """Per-document bigram LM predictability.

    Returns DataFrame(doc_id, n_bigrams, lm_score, lm_q) for documents
    with at least one bigram (docs of < 2 tokens carry no signal and
    are dropped, the F5-degenerate analog).
    """
    toks = documents.select("doc_id", tokens_col().alias("toks")).filter(
        F.size("toks") >= 2
    )
    n = F.size("toks")
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, n - 1).alias("w1"),
                F.slice("toks", 2, n - 1).alias("w2"),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))

    bg_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    prefix_counts = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))

    scored = (
        bg.join(bg_counts, ["w1", "w2"])
        .join(prefix_counts, ["w1"])
        .select(
            "doc_id",
            F.expr(f"div(c_bg * {scale}, c_w1)").alias("term"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("term").alias("lm_score"),
        F.expr("div(sum(term), count(1))").alias("lm_q"),
    )
