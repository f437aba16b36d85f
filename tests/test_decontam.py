"""Benchmark decontamination (operators/decontam.py).

Brute force recomputes per-doc distinct word k-gram STRINGS (no
hashing) and intersects with the benchmark's union — agreement proves
the h60 gram hashing is collision-free on the fixture and the
join+count matches set semantics. Plan asserted: benchmark side
broadcasts (no sort-merge join anywhere), training side has no
shuffle besides the final count aggregate.
"""

from __future__ import annotations

from osm_hadoop_spark.operators.decontam import decontaminate

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),          # bench
    (1, "a quick brown fox jumps over a fence"),                 # hit: 2 grams
    (2, "the quick brown fox jumps over a cliff"),               # hit: 3 grams
    (3, "totally unrelated words in this sentence here"),        # clean
    (4, "short doc"),                                            # < k tokens
    (5, ""),                                                     # empty
    (6, "benchmark two alpha beta gamma delta epsilon zeta"),    # bench
    (7, "prefix alpha beta gamma delta suffix words pad"),       # hit: 1 gram
]
BENCH = "doc_id IN (0, 6)"
K = 4


def _grams(s, k):
    t = s.split()
    return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}


def _brute(docs, bench_ids, k):
    bg = set().union(*(_grams(s, k) for d, s in docs if d in bench_ids and s))
    out = {}
    for d, s in docs:
        if d in bench_ids or not s:
            continue
        n = len(_grams(s, k) & bg)
        if n:
            out[d] = n
    return out


def test_decontaminate_matches_brute(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(df, BENCH, k=K).collect()
    }
    want = _brute(DOCS, {0, 6}, K)
    assert got == want
    assert want == {1: 2, 2: 3, 7: 1}  # pin the crafted expectations
    # benchmark docs themselves are never in the kill list
    assert 0 not in got and 6 not in got


def test_decontaminate_plan_broadcasts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        decontaminate(df, BENCH, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan
