"""Modality-interleaving statistics over interleaved-document span arrays.

The mandated input (BASELINE.json ``input_hint``) is a table of interleaved
text + media documents:

    documents(doc_id, spans: array<struct<kind, text, media_ref, offset>>)

These operators characterize the *interleaving itself* — the per-document
run-length structure of span kinds and the corpus-level kind-transition
matrix. A multimodal training pipeline needs both: mixture audits (text-only
vs image-heavy shards, media density per source), sequence-packing decisions
(long text runs pack differently from alternating text/media), and loader
prefetch planning (transition probabilities say what follows what). The
reference never inspects interleaving (its documents are homogeneous PBF
entity streams, DecodesOsm.scala:17-33); this is an engine addition required
by the interleaved payload axis.

Scale posture: the RLE is computed entirely inside WholeStageCodegen with
array higher-order functions (transform / filter / sequence) — zero explode,
zero shuffle, no Python; a document's runs never leave their row. Per-doc
output is one slim row. The transition matrix explodes only the O(n_spans)
kind bigrams (two short strings per row) into a map-side-combinable hash
aggregate with at most |kinds|^2 result groups — partial aggregation absorbs
the explosion before any exchange, so the shuffle carries ~|kinds|^2 rows per
task regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kinds(spans_col: str) -> F.Column:
    return F.expr(f"transform({spans_col}, s -> s.kind)")


def kind_runs(documents: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Per-document RLE of the span-kind sequence, all in codegen.

    Returns (doc_id, n_spans, n_runs, max_run, runs_rle) where runs_rle is
    the canonical string "kind:len|kind:len|..." (stable across engines, so
    the value oracle hashes it directly).

    Run starts are the indexes i with i = 0 or kind[i] != kind[i-1]; run
    length is next_start - start (n for the virtual end sentinel). Both
    derivations are pure array lambdas — Catalyst evaluates the whole chain
    in one projection, and the spans column itself is read once.
    """
    kinds = _kinds(spans_col)
    n = F.size(F.col(spans_col))
    d = documents.select("doc_id", kinds.alias("_kinds"), n.alias("n_spans"))
    starts = F.expr(
        "filter(sequence(0, n_spans - 1), "
        "i -> i = 0 OR _kinds[i] != _kinds[i - 1])"
    )
    d = d.withColumn("_starts", starts)
    runs = F.expr(
        "transform(_starts, (s, j) -> struct("
        "  _kinds[s] AS kind, "
        "  (CASE WHEN j + 1 < size(_starts) THEN _starts[j + 1] "
        "        ELSE n_spans END) - s AS run_len))"
    )
    d = d.withColumn("_runs", runs)
    return d.select(
        "doc_id",
        "n_spans",
        F.size("_runs").alias("n_runs"),
        F.expr(
            "aggregate(_runs, 0, (acc, r) -> "
            "CASE WHEN r.run_len > acc THEN r.run_len ELSE acc END)"
        ).alias("max_run"),
        F.array_join(
            F.expr(
                "transform(_runs, r -> concat(r.kind, ':', "
                "cast(r.run_len AS string)))"
            ),
            "|",
        ).alias("runs_rle"),
    )


def transition_pairs_col(kinds_col: str = "_kinds") -> F.Column:
    """The (kind_from, kind_to) bigram array with ^/$ sentinels over a
    kind-array column — one pure codegen expression, shared verbatim by
    the batch aggregate and the streaming twin (streaming/spans.py) so
    their semantics cannot drift."""
    return F.expr(
        f"transform(sequence(0, size({kinds_col})), i -> struct("
        f"  CASE WHEN i = 0 THEN '^' ELSE {kinds_col}[i - 1] END AS kind_from, "
        f"  CASE WHEN i = size({kinds_col}) THEN '$' ELSE {kinds_col}[i] END "
        f"  AS kind_to))"
    )


def kind_transitions(documents: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Corpus-level kind-transition counts (the modality bigram matrix).

    One slim explode of (kind_from, kind_to) pairs feeds a hash aggregate;
    partial (map-side) aggregation reduces each task's output to at most
    |kinds|^2 rows before the single exchange. 'start' / 'end' sentinels
    bound the matrix so row sums equal document counts — the standard
    Markov-chain convention, which lets the consumer renormalize to
    transition probabilities without a second pass.
    """
    kinds = _kinds(spans_col)
    d = documents.select("doc_id", kinds.alias("_kinds"))
    return (
        d.select(F.explode(transition_pairs_col("_kinds")).alias("p"))
        .groupBy(
            F.col("p.kind_from").alias("kind_from"),
            F.col("p.kind_to").alias("kind_to"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def media_density(documents: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Per-document media share as an exact integer pair (n_media, n_spans).

    Pure codegen aggregate over the array — no explode, no shuffle. Keeping
    the ratio as an integer pair (not a float division) is the engine-wide
    exactness discipline: the cross-engine value hash compares integers.
    """
    kinds = _kinds(spans_col)
    return documents.select(
        "doc_id",
        F.size(F.col(spans_col)).alias("n_spans"),
        F.size(F.filter(kinds, lambda k: k == F.lit("media"))).alias("n_media"),
    )


def media_context_windows(
    documents: DataFrame, spans_col: str = "spans"
) -> DataFrame:
    """Per media span: the length of the contiguous TEXT run immediately
    before and after it — the caption-pairing primitive. A multimodal
    training pipeline builds (image, surrounding-text) examples exactly
    this way: a media span with n_pre_text = n_post_text = 0 is context-
    free (drop or backfill); long one-sided runs say which side captions
    live on for a given source.

    DataFrame(doc_id, media_offset, n_pre_text, n_post_text).

    Plan: kinds projected once per doc; media positions found with a
    codegen filter over one shared index sequence; ONLY those positions
    explode (media spans, not all spans). Run lengths are array algebra
    against the nearest non-text neighbor:

        pre(i)  = i - 1 - max{j < i : kind[j] != 'text'}   (or -1)
        post(i) = min{j > i : kind[j] != 'text'} - i - 1    (or n)

    computed per exploded row from the carried kinds array — no window,
    no shuffle at all (the operator is a pure projection + generate).
    100 TB posture: output is bounded by the corpus media-span count;
    everything stays in WholeStageCodegen; nothing leaves the row's
    partition.
    """
    n = F.expr(f"size({spans_col})")
    base = documents.select(
        "doc_id",
        _kinds(spans_col).alias("_kinds"),
        F.expr(f"sequence(0, size({spans_col}) - 1)").alias("_idx"),
        n.alias("_n"),
    ).select(
        "doc_id",
        "_kinds",
        "_n",
        F.explode(
            F.expr("filter(_idx, i -> _kinds[i] = 'media')")
        ).alias("media_offset"),
    )
    nearest_pre = (
        "array_max(filter(sequence(0, _n - 1), "
        "j -> j < media_offset AND _kinds[j] <> 'text'))"
    )
    nearest_post = (
        "array_min(filter(sequence(0, _n - 1), "
        "j -> j > media_offset AND _kinds[j] <> 'text'))"
    )
    return base.select(
        "doc_id",
        F.col("media_offset").cast("bigint").alias("media_offset"),
        (
            F.col("media_offset") - 1 - F.coalesce(F.expr(nearest_pre), F.lit(-1))
        ).cast("bigint").alias("n_pre_text"),
        (
            F.coalesce(F.expr(nearest_post), F.col("_n")) - F.col("media_offset") - 1
        ).cast("bigint").alias("n_post_text"),
    )
