"""Leakage-safe split and span-level PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_leakage_safe_split_never_straddles(spark):
    from osm_hadoop_spark.operators.corpus import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # chains 0-1-2, 10-11; everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "doc_a long, doc_b long"
    )
    out = leakage_safe_split(docs, pairs).collect()
    assert len(out) == 200 and len({r["doc_id"] for r in out}) == 200
    by_doc = {r["doc_id"]: r for r in out}
    # cluster members share cluster_id AND split
    assert {by_doc[i]["cluster_id"] for i in (0, 1, 2)} == {0}
    assert len({by_doc[i]["split"] for i in (0, 1, 2)}) == 1
    assert {by_doc[i]["cluster_id"] for i in (10, 11)} == {10}
    assert len({by_doc[i]["split"] for i in (10, 11)}) == 1
    # all three splits appear over 200 singleton-ish clusters w/ 90/5/5
    splits = {r["split"] for r in out}
    assert splits == {"train", "val", "test"}
    # train dominates
    n_train = sum(1 for r in out if r["split"] == "train")
    assert n_train > 150


def _spanned(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_pii_redact_spans_counts_and_invariant(spark):
    from osm_hadoop_spark.operators.curation import pii_redact_spans

    docs = _spanned(spark, [
        (1, [("text", "mail me at a.b@x.org now", None, 0),
             ("media", None, "m1", 1),
             ("text", "call +1 555-1234 twice +1 555-9999", None, 2)]),
        (2, [("text", "clean text", None, 0)]),
    ])
    got = {r["doc_id"]: r for r in pii_redact_spans(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (1, 2)
    assert (got[2]["n_emails"], got[2]["n_phones"]) == (0, 0)

    # the kind/offset fingerprint must equal the INPUT's — redaction cannot
    # perturb span sequence (computed independently here)
    exp_kinds = docs.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.transform(
                    "spans",
                    lambda s: F.concat_ws(
                        ";", s["kind"], s["offset"].cast("string")
                    ),
                ),
                "|",
            )
        ).alias("fp"),
    ).collect()
    for r in exp_kinds:
        assert got[r["doc_id"]]["kinds_fp"] == r["fp"]


def test_pii_redact_spans_rewrites_text(spark):
    from osm_hadoop_spark.operators.curation import pii_redact_spans

    with_pii = _spanned(
        spark, [(1, [("text", "x a.b@x.org y", None, 0)])]
    )
    pre_redacted = _spanned(
        spark, [(1, [("text", "x <EMAIL> y", None, 0)])]
    )
    [a] = pii_redact_spans(with_pii).collect()
    [b] = pii_redact_spans(pre_redacted).collect()
    # redacting the raw doc yields the same content fingerprint as the
    # already-redacted doc -> the text really was rewritten in place
    assert a["spans_fp"] == b["spans_fp"]


def test_pii_redact_spans_no_shuffle(spark):
    from osm_hadoop_spark.operators.curation import pii_redact_spans

    docs = _spanned(spark, [(1, [("text", "t", None, 0)])])
    plan = (
        pii_redact_spans(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_negative_samples_deterministic_and_excluding(spark):
    from osm_hadoop_spark.operators.sampling import negative_samples

    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    anchors = docs.where(F.col("doc_id") % 20 == 0)
    ex = spark.createDataFrame([(0, 50), (40, 7)], "doc_a long, doc_b long")

    a = negative_samples(docs, anchors, k=3, buckets=8, exclude=ex).collect()
    b = negative_samples(
        docs.repartition(13), anchors, k=3, buckets=8, exclude=ex
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # layout-free

    got = {(r["anchor_id"], r["neg_id"]) for r in a}
    assert all(an != ng for an, ng in got)          # never self
    assert (0, 50) not in got and (40, 7) not in got  # exclusion honored
    assert (50, 0) not in got                        # symmetric exclusion
    # each (anchor, probe) yields at most one negative
    keys = [(r["anchor_id"], r["probe"]) for r in a]
    assert len(keys) == len(set(keys))


def test_mixture_rebalance_plan_exactness(spark):
    from osm_hadoop_spark.operators.corpus import mixture_rebalance

    # 60 A docs, 20 B docs; targets 50/50 -> B binds (20/0.5 < 60/0.5 is
    # equal targets, so the smaller group binds), A keeps p = 20/60
    docs = spark.createDataFrame(
        [(i, "A" if i < 60 else "B") for i in range(80)],
        "doc_id long, lang string",
    )
    out = {r["lang"]: r for r in mixture_rebalance(
        docs, {"A": (1, 2), "B": (1, 2)}).collect()}
    a, b = out["A"], out["B"]
    # binding group keeps everything: num == den
    assert b["keep_num"] == b["keep_den"] and b["n_kept"] == 20
    # exact rational: p_A = (1/2 * 20) / (1/2 * 60) = 1/3
    assert a["keep_num"] * 3 == a["keep_den"]
    assert 0 < a["n_kept"] < 60  # hash-Bernoulli around 20
    # determinism: same plan and same kept counts under repartition
    out2 = {r["lang"]: r for r in mixture_rebalance(
        docs.repartition(7), {"A": (1, 2), "B": (1, 2)}).collect()}
    assert {k: tuple(v) for k, v in out.items()} == \
           {k: tuple(v) for k, v in out2.items()}


def test_parse_real_container_formats(spark):
    """Genuine format bytes — a real 1x1 PNG (fixed literal), a GIF87a
    screen descriptor, a BMP and canonical WAV from the generator, and
    junk — parse to the right fields without any codec library."""
    import struct
    import zlib

    from osm_hadoop_spark.operators.multimodal import parse_container_metadata

    ihdr = struct.pack(">IIBBBBB", 7, 9, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    gif = b"GIF87a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
        + b"data" + struct.pack("<I", 0)
    )
    rows = [(1, png), (2, gif), (3, wav), (4, b"junk"), (5, b"")]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r["doc_id"]: r for r in parse_container_metadata(df).collect()}
    assert (got[1]["fmt"], got[1]["width"], got[1]["height"],
            got[1]["bit_depth"]) == ("png", 7, 9, 8)
    assert (got[2]["fmt"], got[2]["width"], got[2]["height"]) == \
        ("gif", 320, 200)
    assert (got[3]["fmt"], got[3]["channels"], got[3]["sample_rate"],
            got[3]["bit_depth"]) == ("wav", 2, 44100, 16)
    assert got[4]["fmt"] == "unknown" and got[5]["fmt"] == "unknown"
    assert got[5]["n_bytes"] == 0
