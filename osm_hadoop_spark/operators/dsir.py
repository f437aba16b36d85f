"""DSIR-style hashed n-gram importance resampling (engine addition).

Data Selection with Importance Resampling (Xie et al. 2023, public) scores
every raw-pool document by how target-like its hashed n-gram distribution
is, then keeps the top of the pool. The reference engine has no data
curation surface at all (SURVEY §2.6); this is one of the
training-data-pipeline operators the brief requires the engine to carry.

Shape of the computation (and why it scales):
  1. one slim long-form relation (doc_id, bucket) — each word bigram is
     h60-hashed into `n_buckets` buckets (the DSIR "hashed n-gram" trick:
     the feature space is a FIXED size regardless of vocabulary, so the
     bucket census below is a bounded dimension table);
  2. ONE hash aggregate over it produces the per-bucket census —
     raw-pool count `r` and target-subset count `t` together (a single
     pass, map-side partial);
  3. the census (≤ n_buckets rows) broadcasts back onto the gram
     relation; per-document scores are one more hash aggregate;
  4. deterministic global top-k (TakeOrdered — no full sort at scale).

No self-join, no all-pairs anywhere: cost is two aggregates + one
broadcast join, all linear in corpus token count. At 100 TB the gram
relation is built twice (census pass + scoring pass); a production run
would checkpoint it once via the snapshot catalog — same plan otherwise.

Integer-exactness discipline (repo convention): the published estimator
ranks by Σ_g log((t_g+1)/(r_g+1)); logs are doubles, so the oracled
surrogate here is the fixed-point per-gram ratio
    score = Σ_g  (SCALE * (t_g + 1)) DIV (r_g + 1),   SCALE = 2^20,
which is monotone per-gram in the same likelihood ratio and bit-exact in
both engines (Spark `DIV` == DuckDB `//` on non-negative BIGINTs).
Swapping in log-ratio weights is a one-line change to the scoring
expression; the distributed plan is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.dedup import _spread
from osm_hadoop_spark.operators.textstats import h60, tokens_col


def bigram_buckets_col(n_buckets: int) -> Column:
    """array<bigint> of hashed word-bigram buckets of `text`, WITH
    multiplicity (DSIR counts occurrences; contrast dedup.shingles_col,
    which is a distinct set)."""
    toks = tokens_col()
    n = F.size(toks)
    return F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: h60(F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        )) % n_buckets,
    )).otherwise(F.array().cast("array<bigint>"))


def doc_buckets(documents: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, bucket) long form — one row per bigram occurrence."""
    slim = _spread(documents.select("doc_id", "text"))
    return slim.select(
        "doc_id", F.explode(bigram_buckets_col(n_buckets)).alias("bucket")
    )


def dsir_scores(
    documents: DataFrame,
    is_target: Column,
    n_buckets: int = 4096,
    scale: int = 1 << 20,
) -> DataFrame:
    """(doc_id, n_grams, score) for every NON-target document with at
    least one bigram. `is_target` marks the in-domain exemplar subset
    (computed from doc_id so both engines agree); target docs define the
    numerator distribution and are excluded from the candidate pool.
    """
    bg = doc_buckets(documents, n_buckets)
    census = bg.groupBy("bucket").agg(
        F.count("*").alias("r"),
        F.count_if(is_target).alias("t"),
    )
    return (
        bg.filter(~is_target)
        .join(F.broadcast(census), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.expr(f"({scale} * (t + 1)) DIV (r + 1)")).alias("score"),
        )
    )


def dsir_select(
    documents: DataFrame,
    target_mod: int = 7,
    n_buckets: int = 4096,
    k: int = 200,
    scale: int = 1 << 20,
) -> DataFrame:
    """Top-k most target-like raw-pool documents, deterministic
    (score DESC, doc_id) order so the selected SET is reproducible."""
    is_target = F.col("doc_id") % target_mod == 0
    scored = dsir_scores(documents, is_target, n_buckets, scale)
    return scored.orderBy(F.desc("score"), "doc_id").limit(k)
