"""Fused corpus-prep pipeline: quality -> lang-ID -> dedup -> sample.

The naive composition of the stage operators (quality_scores, lang_id,
exact_clusters, stratified_sample) joins four doc_id-keyed frames all
derived from the same `documents` scan — Catalyst cannot fuse
self-joins, so the corpus is scanned four times and shuffled three times
on doc_id. At 100 TB that plan is dominated by redundant scans of the
text column.

`corpus_prep` computes the same function in the shape a production job
wants:

  1. ONE projection evaluates every feature (quality counters, language
     hits, text hash) — single scan, whole-stage codegen;
  2. the quality + language gates are FILTERs on that projection
     (pushdown-friendly, no join);
  3. exact dedup is a window `min(doc_id) over (partition by md5(text))`
     — the pipeline's ONLY shuffle;
  4. the stratified sample is a map-only hash filter.

Equivalence with the operator-by-operator chain is pinned by
tests/test_pipeline_ops.py::test_corpus_prep_fused_equals_composed and
by the `corpus_prep_e2e` driver oracle (the DuckDB twin is written
against the semantics, not either plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.sampling import _rate_col
from osm_hadoop_spark.operators.textstats import (
    lang_hits_cols,
    pred_lang_col,
    quality_cols,
    quality_keep_col,
)


def corpus_prep(
    documents: DataFrame,
    rates: dict[str, int],
    default_num: int = 0,
    salt: str = "prep",
) -> DataFrame:
    """documents(doc_id, text) -> (doc_id, pred_lang) surviving the
    quality gate, language-aware stratified sampling, and exact dedup
    (min doc_id per identical text). One scan, one shuffle."""
    q = quality_cols()
    feats = documents.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        quality_keep_col(q).alias("keep"),
        pred_lang_col(lang_hits_cols()).alias("pred_lang"),
    )
    kept = feats.filter("keep")
    w = Window.partitionBy("text_md5")
    deduped = (
        kept.withColumn("rep_doc", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("rep_doc"))
    )
    rate = None
    for val, num in rates.items():
        cond = F.col("pred_lang") == val
        rate = F.when(cond, num) if rate is None else rate.when(cond, num)
    rate = rate.otherwise(default_num) if rate is not None else F.lit(default_num)
    sampled = deduped.filter(
        _rate_col(F.col("doc_id").cast("string"), salt) < rate
    )
    return sampled.select("doc_id", "pred_lang")


def leakage_safe_split(
    documents: DataFrame,
    dup_pairs: DataFrame,
    weights: tuple[int, int, int] = (90, 5, 5),
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: the unit of assignment is the DUPLICATE CLUSTER, not the
    document. Hashing doc_id directly (the naive split) puts two
    near-identical documents in train and test with probability
    2 * p_train * p_test — the classic eval-contamination bug; hashing
    the cluster root makes straddling impossible by construction.

    documents(doc_id, ...), dup_pairs(doc_a, doc_b) -> DataFrame(doc_id,
    cluster_id, split) where split in {'train','val','test'} with
    integer percent weights. Singletons (docs in no pair) are their own
    cluster.

    Plan: connected components over the pair set (O(log n) rounds, the
    pair set is tiny relative to the corpus), then ONE left join of the
    corpus against the (doc_id, cluster) map — broadcastable whenever
    duplicates are a small fraction, which is the operating point of
    every real corpus — and a map-only hash bucket for the split. The
    corpus itself shuffles zero times when the map broadcasts.

    Determinism: the bucket is h60(salt || cluster_id) % 100, so the
    assignment is reproducible across runs, engines, and partitionings,
    and re-running after ADDING documents only moves docs whose cluster
    membership changed (stable splits under corpus growth).
    """
    from osm_hadoop_spark.operators.cc import connected_components
    from osm_hadoop_spark.operators.textstats import h60

    t_train, t_val, t_test = weights
    assert t_train + t_val + t_test == 100
    comp = connected_components(dup_pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("_c")
    )
    rooted = documents.select("doc_id").join(
        F.broadcast(comp), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce(F.col("_c"), F.col("doc_id")).alias("cluster_id")
    )
    bucket = h60(F.concat(F.lit(salt), F.col("cluster_id").cast("string"))) % 100
    return rooted.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < t_train, F.lit("train"))
        .when(bucket < t_train + t_val, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def mixture_rebalance(
    documents: DataFrame,
    targets: dict[str, tuple[int, int]],
    group_col: str = "lang",
    salt: str = "mix",
) -> DataFrame:
    """Exact-rational data-mixture rebalancing: down-sample each group so
    the kept corpus matches target proportions — the 'web/books/code
    mixture' knob of every pretraining pipeline, with no RNG and no
    floats anywhere.

    Down-sampling only (never upsample): the BINDING group is the one
    that runs out first, argmin over groups of c_g / t_g; it keeps
    everything and every other group keeps the exact rational fraction

        p_g = (t_g * c_b) / (t_b * c_g)          (p_b = 1)

    applied as the deterministic gate  h60(salt|doc) % keep_den < keep_num
    — reproducible across engines and partitionings, and the kept set is
    stable under corpus repartitioning. The rational argmin is computed
    by integer cross-multiplication with per-group scale factors
    K / t_g (K = lcm of target numerators times denominators folded in),
    so no division ever happens.

    Returns the per-group census: DataFrame(group, n_in, keep_num,
    keep_den, n_kept) — n_kept ~= n_in * p_g with hash-Bernoulli
    variance; the PLAN (keep_num/keep_den) is exact.

    Plan: one tiny census aggregate, one single-row binding aggregate
    (max over |groups| rows), broadcast back over the corpus for the
    gated recount. The corpus shuffles zero times; it is scanned twice
    (census + apply) — cache upstream or fold the census into a prior
    stage if the scan dominates.
    """
    from math import lcm

    from osm_hadoop_spark.operators.textstats import h60

    groups = sorted(targets)
    k = lcm(*[targets[g][0] * targets[g][1] for g in groups])
    # scale_g = K * den_g / num_g: c_g * scale_g orders groups by c_g/t_g
    scale = {g: k * targets[g][1] // targets[g][0] for g in groups}
    tmap = F.create_map(
        *[x for g in groups for x in (F.lit(g), F.lit(scale[g]))]
    )
    num_map = F.create_map(
        *[x for g in groups for x in (F.lit(g), F.lit(targets[g][0]))]
    )
    den_map = F.create_map(
        *[x for g in groups for x in (F.lit(g), F.lit(targets[g][1]))]
    )
    docs = documents.where(F.col(group_col).isin(groups))
    census = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_in")
    )
    binding = census.agg(
        F.min(
            F.struct(
                (F.col("n_in") * tmap[F.col("grp")]).alias("key"),
                F.col("grp").alias("b_grp"),
                F.col("n_in").alias("c_b"),
            )
        ).alias("_b")
    ).select(
        F.col("_b.b_grp").alias("b_grp"), F.col("_b.c_b").alias("c_b")
    )
    # p_g = t_g*c_b / (t_b*c_g) with t = num/den:
    #   keep_num = num_g * den_b * c_b ; keep_den = num_b * den_g * c_g
    # (binding group: keep_num == keep_den -> keeps everything)
    plan = census.crossJoin(F.broadcast(binding)).select(
        "grp",
        "n_in",
        (num_map[F.col("grp")] * den_map[F.col("b_grp")] * F.col("c_b"))
        .alias("keep_num"),
        (num_map[F.col("b_grp")] * den_map[F.col("grp")] * F.col("n_in"))
        .alias("keep_den"),
    )
    gated = docs.join(
        F.broadcast(plan), docs[group_col] == plan["grp"]
    ).where(
        h60(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
        % F.col("keep_den")
        < F.col("keep_num")
    )
    kept = gated.groupBy("grp").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        plan.join(kept, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            F.col("n_in").cast("bigint").alias("n_in"),
            F.col("keep_num").cast("bigint").alias("keep_num"),
            F.col("keep_den").cast("bigint").alias("keep_den"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )
