"""Containment join (dedup.py::containment_pairs) vs a set brute force,
including the asymmetric case symmetric Jaccard misses."""

from __future__ import annotations


def _brute(docs, t_num, t_den, k=3):
    def sh(text):
        toks = text.split()
        return {tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    sets = {d: sh(t) for d, t in docs if len(t.split()) >= k}
    out = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b:
                inter = len(sa & sb)
                if inter * t_den >= len(sa) * t_num:
                    out[(a, b)] = (inter, len(sa))
    return out


def _docs():
    lifted = "the quick brown fox jumps over the lazy dog tonight"
    long_doc = (
        "intro words here " + lifted
        + " and then a very long tail of unrelated filler content that "
        + "keeps going with many extra tokens far beyond the source text"
    )
    return [
        ("a", lifted),                      # contained in b almost fully
        ("b", long_doc),                    # contains a; a NOT ~ b (Jaccard)
        ("c", lifted),                      # exact dup of a: mutual
        ("d", "totally different words that never overlap with anything"),
        ("e", "too few"),                   # under k tokens: dropped
    ]


def test_containment_matches_brute(spark):
    from osm_hadoop_spark.operators.dedup import containment_pairs

    docs = _docs()
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {(r.doc_a, r.doc_b): (r.inter, r.n_a)
           for r in containment_pairs(df, t_num=8, t_den=10).collect()}
    want = _brute(docs, 8, 10)
    assert got == want
    assert ("a", "b") in got          # lifted paragraph found
    assert ("b", "a") not in got      # asymmetric: b is NOT inside a
    assert ("a", "c") in got and ("c", "a") in got   # exact dup: mutual
    assert not any("e" in p for p in got)


def test_containment_threshold_exactness(spark):
    from osm_hadoop_spark.operators.dedup import containment_pairs

    # A has exactly 5 shingles, 4 shared: C = 4/5 = 0.8 — the >= gate
    # must keep it at t=8/10 and drop it at t=9/10
    a = "w1 w2 w3 w4 w5 w6 xx"          # 5 shingles, last one unique
    b = "w1 w2 w3 w4 w5 w6 yy zz"       # shares the first 4
    df = spark.createDataFrame([("a", a), ("b", b)],
                               "doc_id string, text string")
    keep = {(r.doc_a, r.doc_b)
            for r in containment_pairs(df, t_num=8, t_den=10).collect()}
    drop = {(r.doc_a, r.doc_b)
            for r in containment_pairs(df, t_num=9, t_den=10).collect()}
    assert ("a", "b") in keep and ("a", "b") not in drop
