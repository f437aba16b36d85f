"""Semantics of the corpus-curation operators (operators/curation.py).

The driver's sf0.01 oracle run proves cross-engine value equality; these
tests pin the SEMANTICS on constructed documents where every expected value
is hand-computable — a repetitive doc that must fail the Gopher gate, a
planted benchmark overlap, a known email/phone redaction, and a unit
square's shoelace measure.
"""

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_gate_flags_dup_lines_and_dominant_bigram(spark):
    from osm_hadoop_spark.operators.curation import repetition_signals

    rows = [
        # 4 lines, 2 duplicated beyond first (dup frac 1/2 > 3/10) -> drop
        (1, "same line\nsame line\nsame line\nother line"),
        # dominant bigram: "buy now" is 4 of 7 bigrams (> 1/5) -> drop
        (2, "buy now buy now buy now buy now"),
        # clean prose, no repeats -> keep
        (3, "the quick brown fox jumps over the lazy dog"),
        # degenerate: empty text -> 0/0 everywhere, keep
        (4, ""),
        # single token: no bigrams, one line -> keep
        (5, "word"),
    ]
    out = {
        r["doc_id"]: r
        for r in repetition_signals(_docs(spark, rows)).collect()
    }
    assert out[1]["n_lines"] == 4 and out[1]["n_dup_lines"] == 2
    assert not out[1]["keep"]
    # "buy now": tokens b n b n b n b n -> 7 bigrams, "buy now" x4, "now buy" x3
    assert out[2]["n_bigrams"] == 7 and out[2]["top_bigram_count"] == 4
    assert not out[2]["keep"]
    assert out[3]["keep"]
    # "the quick ... the lazy": 8 bigrams all distinct -> top count 1
    assert out[3]["top_bigram_count"] == 1
    assert out[4]["n_lines"] == 0 and out[4]["n_bigrams"] == 0 and out[4]["keep"]
    assert out[5]["n_bigrams"] == 0 and out[5]["keep"]


def test_decontaminate_finds_planted_3gram_overlap(spark):
    from osm_hadoop_spark.operators.curation import decontaminate

    rows = [
        # benchmark doc (id % 7 == 0)
        (0, "what is the capital of france paris obviously"),
        # contaminated: shares the 3-gram "capital of france"
        (1, "quiz answer the capital of france is paris"),
        # clean
        (2, "completely unrelated training text goes here"),
        # short doc (< 3 tokens): zero ngrams, clean by construction
        (3, "two words"),
    ]
    out = {
        r["doc_id"]: r
        for r in decontaminate(_docs(spark, rows), n=3, bench_mod=7).collect()
    }
    assert set(out) == {1, 2, 3}  # benchmark doc excluded from output
    assert out[1]["contaminated"] and out[1]["n_overlap"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0
    assert not out[3]["contaminated"]


def test_pii_redact_counts_and_hash(spark):
    from osm_hadoop_spark.operators.curation import pii_redact

    rows = [
        (1, "mail me at alice.smith+x@corp-mail.example.org or +1 555-0142 now"),
        (2, "no pii here at all"),
    ]
    docs = _docs(spark, rows).withColumn("pii_text", F.col("text"))
    out = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0
    import hashlib

    expected = "mail me at <EMAIL> or <PHONE> now"
    assert out[1]["redacted_md5"] == hashlib.md5(expected.encode()).hexdigest()
    assert out[1]["n_chars_redacted"] == len(expected)
    assert out[2]["redacted_md5"] == hashlib.md5(b"no pii here at all").hexdigest()


def test_shoelace_unit_square_and_orientation(spark):
    from osm_hadoop_spark.functions.geodesic import shoelace_cols

    df = spark.createDataFrame(
        [
            # CCW unit square: area2 = +2, centroid (0.5, 0.5)
            (1, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]),
            # CW traversal of the same square: area2 = -2
            (2, [0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0]),
            # degenerate collinear triple: zero area
            (3, [0.0, 1.0, 2.0], [0.0, 1.0, 2.0]),
        ],
        "way_id bigint, xs array<double>, ys array<double>",
    )
    c = shoelace_cols()
    out = {
        r["way_id"]: r
        for r in df.select(
            "way_id", c["area2"].alias("a2"), c["cx_num"].alias("cx"),
            c["cy_num"].alias("cy")
        ).collect()
    }
    assert out[1]["a2"] == 2 and out[2]["a2"] == -2 and out[3]["a2"] == 0
    # Cx = cx_num / (3 * area2) = 3/6 = 0.5 for the CCW square
    assert out[1]["cx"] == 3 and out[1]["cy"] == 3
    # orientation flips every numerator's sign together
    assert out[2]["cx"] == -3 and out[2]["cy"] == -3


def test_curation_plans_are_jvm_only(spark):
    """No BatchEvalPython / ArrowEvalPython anywhere in the three curation
    plans — the hot path stays in whole-stage codegen."""
    from osm_hadoop_spark.operators.curation import (
        decontaminate,
        pii_redact,
        repetition_signals,
        with_synthetic_pii,
    )

    docs = _docs(spark, [(1, "a b c d e"), (2, "x y z")])
    for df in (
        repetition_signals(docs),
        decontaminate(docs, bench_mod=2),
        pii_redact(with_synthetic_pii(docs)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


@pytest.fixture(scope="module")
def flat_docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


def test_pack_documents_vs_brute_and_invariants(spark, flat_docs):
    """pack_documents must equal an independent Python concat-and-chunk
    packer, reassemble losslessly per doc, and fill every non-tail pack
    to exactly `capacity`."""
    from osm_hadoop_spark.operators.curation import pack_documents

    cap = 64
    corpus = flat_docs.limit(60)
    out = pack_documents(corpus, capacity=cap).collect()

    pdf = corpus.select("lang", "doc_id", "text").toPandas()
    want = set()
    for lang in sorted(pdf["lang"].unique()):
        sub = pdf[pdf["lang"] == lang].sort_values("doc_id")
        off = 0
        for _, r in sub.iterrows():
            n = len(r["text"].split())
            if n == 0:
                continue
            s = off
            for pack in range(s // cap, (s + n - 1) // cap + 1):
                lo = max(s, pack * cap)
                hi = min(s + n, (pack + 1) * cap)
                want.add((lang, pack, r["doc_id"], lo - s, hi - lo))
            off += n
    got = {
        (r["lang"], r["pack_id"], r["doc_id"],
         r["tok_start_in_doc"], r["tok_in_pack"])
        for r in out
    }
    assert got == want and len(want) > 0

    # lossless per doc; full non-tail packs
    per_doc = {}
    per_pack = {}
    for lang, pack, d, _, t in got:
        per_doc[d] = per_doc.get(d, 0) + t
        per_pack[(lang, pack)] = per_pack.get((lang, pack), 0) + t
    for _, r in pdf.iterrows():
        n = len(r["text"].split())
        if n:
            assert per_doc[r["doc_id"]] == n
    for lang in pdf["lang"].unique():
        packs = sorted(p for l, p in per_pack if l == lang)
        for p in packs[:-1]:
            assert per_pack[(lang, p)] == cap
    # at least one doc straddles a boundary (the semantics under test)
    assert any(
        sum(1 for l2, p2, d2, _, _ in got if d2 == d) > 1
        for _, _, d, _, _ in got
    )
