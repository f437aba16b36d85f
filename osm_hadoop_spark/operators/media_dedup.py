"""Asset-level media deduplication over interleaved documents.

A multimodal corpus at 10^12-document scale stores media by reference
(``media_ref`` in the span struct, BASELINE.json ``input_hint``); the same
underlying bytes routinely appear under many refs (re-uploads, mirrors,
crawl duplicates). Asset dedup collapses refs to one canonical ref per
content hash and rewrites documents to point at the canonical asset —
storage dedup for the media store AND a prerequisite for media-aware doc
dedup (two docs differing only in mirrored asset refs become identical).

Reference analog: none (the reference's payloads are geometry-only); this
is the multimodal-pipeline addition required by the interleaved axis. The
span-sequence invariant is preserved by construction everywhere except the
substituted ``media_ref`` cells: kind/text/offset and span ORDER are
untouched, proven by `tests/test_media_dedup.py` comparing fingerprints
with the substitution applied independently.

Scale shape (the 100 TB plan):
  1. asset table: one DISTINCT over slim (media_ref, content_h) rows —
     map-side-combinable hash aggregate.
  2. canonical ref per content: min(media_ref) groupBy content_h — again a
     partial-agg hash aggregate; ties broken by the total string order.
  3. rewrite: explode spans (slim rows), LEFT join media spans to the
     ref -> canonical map on media_ref (a shuffle hash join on both sides —
     the asset map at corpus scale is NOT broadcastable, and Catalyst's AQE
     will still broadcast it automatically when it is small), then
     reassemble per doc via the J2 discipline: groupBy(doc_id) +
     array_sort(collect_list(struct(pos, span))). No row ever carries more
     than its own document.

Content hashing: production content_h = h60 over the asset bytes (see
operators/multimodal.py::decode_metadata for the byte plumbing); the driver
query simulates bytes deterministically from the ref so the DuckDB twin can
re-derive identical hashes without a media store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def asset_table(
    documents: DataFrame, content_h: Column, spans_col: str = "spans"
) -> DataFrame:
    """Distinct media assets with content hash: (media_ref, content_h).

    `content_h` is a Column over the exploded span frame (columns doc_id,
    pos, kind, text, media_ref, offset) producing the asset's content hash.
    """
    sp = documents.select(
        "doc_id", F.posexplode(spans_col).alias("pos", "s")
    ).select(
        "doc_id", "pos", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    return (
        sp.filter(F.col("kind") == "media")
        .select("media_ref", content_h.alias("content_h"))
        .distinct()
    )


def canonical_assets(assets: DataFrame) -> DataFrame:
    """content_h -> canonical ref (min string) + ref/popularity census."""
    return assets.groupBy("content_h").agg(
        F.min("media_ref").alias("canonical_ref"),
        F.count(F.lit(1)).alias("n_refs"),
    )


def rewrite_documents(
    documents: DataFrame, ref_map: DataFrame, spans_col: str = "spans"
) -> DataFrame:
    """Rewrite media_ref cells through ref_map(media_ref, canonical_ref).

    Non-media spans and span order are preserved bit-exactly (LEFT join:
    an unmapped ref — never produced by canonical_assets, but defensively —
    keeps its original value). Returns documents(doc_id, spans) with the
    same schema as the input.
    """
    sp = documents.select(
        "doc_id", F.posexplode(spans_col).alias("pos", "s")
    ).select(
        "doc_id", "pos", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    # fresh column names so a ref_map sharing lineage with `documents`
    # (e.g. rewriting the output of a previous rewrite) never trips the
    # ambiguous-self-join analyzer
    rm = ref_map.select(
        F.col("media_ref").alias("_map_ref"),
        F.col("canonical_ref").alias("_map_canon"),
    )
    joined = sp.join(
        rm,
        on=(sp["media_ref"] == rm["_map_ref"]) & (sp["kind"] == "media"),
        how="left",
    ).select(
        sp["doc_id"],
        sp["pos"],
        sp["kind"],
        sp["text"],
        F.coalesce(rm["_map_canon"], sp["media_ref"]).alias("media_ref"),
        sp["offset"],
    )
    return joined.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("pos", "kind", "text", "media_ref", "offset")
                )
            ),
            lambda r: F.struct(
                r["kind"].alias("kind"),
                r["text"].alias("text"),
                r["media_ref"].alias("media_ref"),
                r["offset"].alias("offset"),
            ),
        ).alias(spans_col)
    )


def ref_to_canonical(assets: DataFrame) -> DataFrame:
    """(media_ref, canonical_ref) join map from the asset table."""
    return assets.join(
        canonical_assets(assets).select("content_h", "canonical_ref"),
        "content_h",
    ).select("media_ref", "canonical_ref")
