"""bm25_topk_terms: brute-force cross-check + determinism of ties."""

import math

import pandas as pd
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.tfidf import bm25_topk_terms, term_frequencies

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the dog ate the cat food"),
    ("d3", "mat mat mat dog"),
    ("d4", ""),
    ("d5", "zig"),
]


def _brute(k=3):
    tf = {}
    for did, text in DOCS:
        for t in [w for w in "".join(c if c.isalpha() else " " for c in text.lower()).split() if w]:
            tf[(did, t)] = tf.get((did, t), 0) + 1
    dl = {}
    for (did, _), n in tf.items():
        dl[did] = dl.get(did, 0) + n
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    n_docs = float(len(dl))
    total = float(sum(dl.values()))
    rows = []
    for (did, t), n in tf.items():
        score = (n * 2.2 / (n + 0.3 + 0.9 * dl[did] * n_docs / total)) * (
            (n_docs + 1.0) / (df[t] + 0.5)
        )
        rows.append((did, t, n, df[t], score))
    out = []
    for did in dl:
        doc_rows = sorted(
            [r for r in rows if r[0] == did], key=lambda r: (-r[4], r[1])
        )[:k]
        out.extend(
            (did, t, n, d, s, i + 1) for i, (_, t, n, d, s) in enumerate(doc_rows)
        )
    return sorted(out)


def test_matches_bruteforce(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = sorted(
        tuple(r) for r in bm25_topk_terms(docs, k=3).collect()
    )
    want = _brute(3)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4] and g[5] == w[5], (g, w)
        assert math.isclose(g[4], w[4], rel_tol=1e-12), (g, w)


def test_empty_doc_emits_nothing_and_ranks_dense(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    out = bm25_topk_terms(docs, k=3).toPandas()
    assert "d4" not in set(out["doc_id"])
    # d5 has a single term -> exactly one row, rank 1
    d5 = out[out["doc_id"] == "d5"]
    assert list(d5["rank"]) == [1] and list(d5["term"]) == ["zig"]
    # every doc's ranks are 1..n with no gaps
    for _, grp in out.groupby("doc_id"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))


def test_term_frequencies_tokenizer(spark):
    docs = spark.createDataFrame([("d", "Ab,b   C1c c")], "doc_id string, text string")
    got = {(r["term"], r["tf"]) for r in term_frequencies(docs).collect()}
    # lowercased, split on every non-[a-z] run: "ab","b","c","c","c"
    assert got == {("ab", 1), ("b", 1), ("c", 3)}


def test_cooccurrence_pairs_vs_brute(spark):
    """cooccurrence_pairs must equal an independent Python sliding-window
    pair counter (own tokenizer/hash), including same-term pairs and the
    exact PMI sufficient statistics."""
    import hashlib

    from osm_hadoop_spark.operators.textstats import cooccurrence_pairs

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(40)

    def h60py(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    w, mc = 2, 2
    uni, pair, tot = {}, {}, 0
    for r in docs.select("text").collect():
        toks = r["text"].split()
        hs = [h60py(t) for t in toks]
        for h in hs:
            uni[h] = uni.get(h, 0) + 1
            tot += 1
        for i in range(len(hs)):
            for j in range(i + 1, min(i + w, len(hs) - 1) + 1):
                key = (min(hs[i], hs[j]), max(hs[i], hs[j]))
                pair[key] = pair.get(key, 0) + 1
    want = {
        (a, b, n, uni[a], uni[b], tot)
        for (a, b), n in pair.items() if n >= mc
    }
    got = {
        (r["a"], r["b"], r["n_ab"], r["n_a"], r["n_b"], r["n_tot"])
        for r in cooccurrence_pairs(docs, window=w, min_count=mc).collect()
    }
    assert got == want and len(want) > 0
    # at least one within-window same-term pair must be exercised OR the
    # canonicalization must have merged (i,j) and (j,i) orders: check the
    # canonical invariant a <= b on every row
    assert all(a <= b for a, b, *_ in got)
