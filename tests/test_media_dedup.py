"""Asset-level media dedup (operators/media_dedup.py): canonical mapping,
span-sequence preservation outside the substituted ref cells, idempotence."""

import pyspark.sql.functions as F


def _docs(spark):
    rows = [
        # doc a: two refs for the same content (r1, r3) + text
        ("a", [("text", "hello", None, 0),
               ("media", None, "media://r1", 1),
               ("media", None, "media://r3", 2)]),
        # doc b: the canonical ref itself + unrelated asset
        ("b", [("media", None, "media://r0", 0),
               ("media", None, "media://x9", 1)]),
        # doc c: no media at all
        ("c", [("text", "only text", None, 0)]),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


# content: r0, r1, r3 share bytes; x9 is unique
_CONTENT = {"media://r0": 7, "media://r1": 7, "media://r3": 7, "media://x9": 9}


def _content_h():
    return F.when(F.col("media_ref").isin("media://r0", "media://r1",
                                          "media://r3"), F.lit(7)).otherwise(
        F.lit(9)
    ).cast("bigint")


def test_canonical_and_rewrite(spark):
    from osm_hadoop_spark.operators.media_dedup import (
        asset_table, canonical_assets, ref_to_canonical, rewrite_documents,
    )

    docs = _docs(spark)
    assets = asset_table(docs, _content_h())
    canon = {r["content_h"]: (r["canonical_ref"], r["n_refs"])
             for r in canonical_assets(assets).collect()}
    assert canon == {7: ("media://r0", 3), 9: ("media://x9", 1)}

    out = rewrite_documents(docs, ref_to_canonical(assets))
    got = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in r["spans"]] for r in out.collect()}
    # all mirrored refs now canonical; order, kinds, text, offsets untouched
    assert got["a"] == [("text", "hello", None, 0),
                        ("media", None, "media://r0", 1),
                        ("media", None, "media://r0", 2)]
    assert got["b"] == [("media", None, "media://r0", 0),
                        ("media", None, "media://x9", 1)]
    assert got["c"] == [("text", "only text", None, 0)]


def test_rewrite_idempotent(spark):
    from osm_hadoop_spark.operators.media_dedup import (
        asset_table, ref_to_canonical, rewrite_documents,
    )
    from osm_hadoop_spark.sources.spans import span_fingerprint60

    docs = _docs(spark)
    rmap = ref_to_canonical(asset_table(docs, _content_h()))
    once = rewrite_documents(docs, rmap)
    twice = rewrite_documents(once, rmap)
    fp1 = {r["doc_id"]: r["span_fp"]
           for r in span_fingerprint60(once).collect()}
    fp2 = {r["doc_id"]: r["span_fp"]
           for r in span_fingerprint60(twice).collect()}
    assert fp1 == fp2 and len(fp1) == 3
