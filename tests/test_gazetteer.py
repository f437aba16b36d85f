"""phrase_match / phrase_census vs a brute sliding-window twin."""

import re


def _brute(docs, phrases):
    hits = []
    for did, text in docs:
        toks = re.split(r"\s+", text.strip()) if text.strip() else []
        for pid, ph in phrases:
            pt = re.split(r"\s+", ph.strip())
            for s in range(len(toks) - len(pt) + 1):
                if toks[s:s + len(pt)] == pt:
                    hits.append((did, pid, s))
    return sorted(hits)


def _run(spark, docs, phrases):
    from osm_hadoop_spark.operators.gazetteer import phrase_match

    d = spark.createDataFrame(docs, "doc_id: string, text: string")
    p = spark.createDataFrame(phrases, "phrase_id: long, phrase: string")
    got = sorted(
        (r["doc_id"], r["phrase_id"], r["start"])
        for r in phrase_match(d, p).collect()
    )
    assert got == _brute(docs, phrases)
    return got


def test_basic_and_overlap(spark):
    docs = [
        ("d1", "a b c a b c a b"),
        ("d2", "x x x x"),
        ("d3", ""),
    ]
    phrases = [(1, "a b"), (2, "b c a"), (3, "x x x"), (4, "zz qq")]
    got = _run(spark, docs, phrases)
    # overlapping triple-repeat: "x x x x" matches "x x x" at 0 AND 1
    assert [(d, p, s) for d, p, s in got if p == 3] == [
        ("d2", 3, 0), ("d2", 3, 1)
    ]
    assert all(p != 4 for _, p, _ in got)


def test_repeated_token_inside_phrase(spark):
    # phrase with an internal repeat must not over-count slots
    docs = [("d", "m n m n m")]
    phrases = [(1, "m n m"), (2, "n m n")]
    got = _run(spark, docs, phrases)
    assert got == [("d", 1, 0), ("d", 1, 2), ("d", 2, 1)]


def test_single_token_phrases(spark):
    docs = [("d", "p q p")]
    got = _run(spark, docs, [(1, "p"), (2, "q")])
    assert got == [("d", 1, 0), ("d", 1, 2), ("d", 2, 1)]


def test_census_zero_hits_emit(spark):
    from osm_hadoop_spark.operators.gazetteer import phrase_census

    d = spark.createDataFrame(
        [("d1", "a b a b"), ("d2", "a b")], "doc_id: string, text: string"
    )
    p = spark.createDataFrame(
        [(1, "a b"), (2, "never here")], "phrase_id: long, phrase: string"
    )
    got = {r["phrase"]: (r["n_hits"], r["n_docs"])
           for r in phrase_census(d, p).collect()}
    assert got == {"a b": (3, 2), "never here": (0, 0)}
