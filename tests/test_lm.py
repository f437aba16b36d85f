"""Bigram LM gate (operators/lm.py) vs a dict-based Python model."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

SCALE = 1 << 20


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _synth_docs():
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast", "a"]
    docs = []
    for i in range(120):
        n = _h(f"len{i}", 12)  # includes 0- and 1-token docs
        words = [vocab[_h(f"w{i}_{j}", len(vocab))] for j in range(n)]
        docs.append((i, " ".join(words)))
    # handcrafted: repetitive common words, corpus-disjoint vocabulary
    # (every bigram AND prefix is a singleton -> p = 1 exactly, the MLE
    # singleton property), empty text, whitespace-only, single token
    docs += [
        (500, "the cat " * 30),
        (501, "q1 q2 q3 q4 q5 q6 q7 q8"),
        (502, ""),
        (503, "   "),
        (504, "lonely"),
    ]
    return docs


def _brute(docs):
    toks = {i: t.split() for i, t in docs}
    bg_c: Counter = Counter()
    pre_c: Counter = Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            bg_c[(a, b)] += 1
            pre_c[a] += 1
    out = {}
    for i, ws in toks.items():
        if len(ws) < 2:
            continue
        terms = [
            SCALE * bg_c[(a, b)] // pre_c[a] for a, b in zip(ws, ws[1:])
        ]
        out[i] = (len(terms), sum(terms), sum(terms) // len(terms))
    return out


def test_lm_scores_match_brute(spark):
    from osm_hadoop_spark.operators.lm import bigram_lm_scores

    docs = _synth_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.lm_score, r.lm_q)
        for r in bigram_lm_scores(df).collect()
    }
    want = _brute(docs)
    assert got == want
    assert 502 not in got and 503 not in got and 504 not in got
    # corpus-disjoint doc: every bigram is a singleton with a singleton
    # prefix, so each term is exactly SCALE (the MLE singleton property)
    assert got[501] == (7, 7 * SCALE, SCALE)
    # common words with competing continuations score strictly below 1
    assert 0 < got[500][2] < SCALE


def test_lm_plan_no_python(spark):
    from osm_hadoop_spark.operators.lm import bigram_lm_scores

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = bigram_lm_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
