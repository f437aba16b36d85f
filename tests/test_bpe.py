"""BPE merge application (operators/bpe.py).

The brute force is a literal per-rank greedy scan in Python (index
walking, not a fold), so agreement proves the fold formulation
implements greedy left-to-right non-overlapping merging. Crafted cases:
an overlapping run ("aaa" under (a,a) -> [aa, a]), chained merges (a
later rank consuming an earlier rank's token), and the DuckDB rendering
of the SAME merge table executed directly against duckdb to pin the
cross-engine twin at the unit level.
"""

from __future__ import annotations

from osm_hadoop_spark.operators.bpe import (
    bpe_apply,
    duckdb_fold_sql,
    spark_fold_sql,
)

MERGES = [("e", " "), ("e ", "t"), ("a", "s"), ("t", "a"), ("s", " "), ("ta", "b")]


def _brute_one(s, merges):
    toks = list(s)
    for a, b in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_brute_crafted_semantics():
    # greedy non-overlap and chaining, pinned at the brute level first
    assert _brute_one("aaa", [("a", "a")]) == ["aa", "a"]
    assert _brute_one("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert _brute_one("value table", MERGES)[:3] == ["v", "a", "l"]
    # 'e'+' ' -> 'e ', then 'e '+'t' -> 'e t' (rank chaining)
    assert "e t" in _brute_one("value table", MERGES)
    # 't'+'a' -> 'ta', then 'ta'+'b' -> 'tab' (double chaining); in
    # "value table" the space-t was already eaten by rank 2 ("e ", "t"),
    # so chain order matters — pin it on an input where the t survives
    assert _brute_one("tables", MERGES) == ["tab", "l", "e", "s"]
    assert "tab" not in _brute_one("value table", MERGES)


def test_bpe_apply_matches_brute(spark):
    docs = {
        1: "value table scan of the stable database",
        2: "aaaa",
        3: "e te te t",
        4: "x",
        5: "",  # dropped
        6: "fast sort pass cast",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["toks"])
        for r in bpe_apply(df, MERGES, prefix_len=40).collect()
    }
    want = {
        d: (len(t), "|".join(t))
        for d, s in docs.items()
        if s
        for t in [_brute_one(s[:40], MERGES)]
    }
    assert got == want
    assert 5 not in got
    # MERGES has no (a, a) rank, so "aaaa" passes through untouched
    assert got[2] == (4, "a|a|a|a")


def test_duckdb_fold_twin_matches_brute():
    import duckdb

    con = duckdb.connect()
    for s in ("value table scan", "aaaa", "e te te t", "stable tabs"):
        sql = duckdb_fold_sql(MERGES, "string_split(?, '')")
        got = con.execute(f"SELECT {sql}", [s]).fetchone()[0]
        assert got == _brute_one(s, MERGES), s


def _brute_train(corpus, rounds):
    """Literal reference trainer: per-round Counter census over the
    per-doc greedy tokenization, argmax by (-count, pa, pb)."""
    from collections import Counter

    learned, out = [], []
    for k in range(rounds):
        c = Counter()
        for s in corpus:
            toks = _brute_one(s, learned)
            c.update(zip(toks, toks[1:]))
        if not c:
            break
        (pa, pb), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((k, pa, pb, n))
        learned.append((pa, pb))
    return out


def test_bpe_train_matches_brute(spark):
    from osm_hadoop_spark.operators.bpe import bpe_train

    corpus = [
        "the table the table the stable",
        "that that that hat",
        "a tab a tab a tab",
        "x",
        "",
    ]
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["pa"], r["pb"], r["n_pairs"])
        for r in bpe_train(df, rounds=6, prefix_len=40)
        .orderBy("merge_rank")
        .collect()
    ]
    want = _brute_train([s[:40] for s in corpus if s], 6)
    assert got == want
    # training must CHAIN: some later rank consumes an earlier rank's
    # merged token (the whole point of BPE over unigram counting)
    merged = {pa + pb for _, pa, pb, _ in want}
    assert any(pa in merged or pb in merged for _, pa, pb, _ in want)


def test_bpe_train_exhausts_early(spark):
    from osm_hadoop_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(1, "ab"), (2, "ab")], "doc_id long, text string")
    got = bpe_train(df, rounds=5).collect()
    # round 0 merges (a, b); afterwards every doc is one token -> stop
    assert len(got) == 1
    assert (got[0]["pa"], got[0]["pb"], got[0]["n_pairs"]) == ("a", "b", 2)


def test_pair_counts_plan_shape(spark):
    from osm_hadoop_spark.operators.bpe import pair_counts

    df = spark.createDataFrame([(1, "value table")], "doc_id long, text string")
    plan = (
        pair_counts(df, MERGES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan
    # spread exchange + the single count-aggregate exchange, nothing else
    assert plan.count("Exchange") == 2


def test_bpe_plan_shape(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1, "value table")], "doc_id long, text string")
    plan = (
        bpe_apply(df, MERGES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan
    # exactly the spread exchange; the fold ladder is one projection
    assert plan.count("Exchange") == 1
