"""Peak-concurrency sweep line, column profiler, blocklist census."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_peak_concurrency_known(spark):
    from osm_hadoop_spark.operators.sweepline import peak_concurrency

    # u1: [0,10) [10,20) touch -> never concurrent; [5,8) overlaps the
    # first -> depth 2 first reached at t=5.
    # u2: three nested intervals -> depth 3 at t=2.
    # u3: single interval -> peak 1 at its start.
    rows = [
        (1, 0, 10), (1, 10, 20), (1, 5, 8),
        (2, 0, 100), (2, 1, 50), (2, 2, 30),
        (3, 7, 9),
    ]
    iv = spark.createDataFrame(rows, "user_id long, start_us long, end_us long")
    got = {
        r["user_id"]: (r["peak"], r["first_peak_us"], r["n_intervals"])
        for r in peak_concurrency(iv).collect()
    }
    assert got == {1: (2, 5, 3), 2: (3, 2, 3), 3: (1, 7, 1)}


def test_peak_concurrency_half_open(spark):
    """An interval ending at t does NOT overlap one starting at t — the
    (ts, delta) sort closes before it opens."""
    from osm_hadoop_spark.operators.sweepline import peak_concurrency

    iv = spark.createDataFrame(
        [(9, 0, 5), (9, 5, 10), (9, 10, 15)],
        "user_id long, start_us long, end_us long",
    )
    [r] = peak_concurrency(iv).collect()
    assert (r["peak"], r["first_peak_us"]) == (1, 0)


def test_profile_columns_stats(spark):
    from osm_hadoop_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (2, None), (7, "a")], "k long, s string"
    )
    got = {r["col_name"]: r.asDict() for r in profile_columns(df, ["k", "s"]).collect()}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_null"] == 0
    assert got["k"]["ndv"] == 3
    assert (got["k"]["min_val"], got["k"]["max_val"]) == ("1", "7")
    assert got["s"]["n_null"] == 1 and got["s"]["ndv"] == 2
    assert (got["s"]["min_val"], got["s"]["max_val"]) == ("a", "b")


def test_profile_single_scan(spark):
    """The multi-column profile must plan ONE scan of the input (Expand
    multi-distinct strategy), not one scan per column."""
    from osm_hadoop_spark.operators.profile import profile_columns

    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b")
    )
    plan = profile_columns(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1
    assert "Expand" in plan


def test_equi_width_histogram_clamps(spark):
    from osm_hadoop_spark.operators.profile import equi_width_histogram

    df = spark.createDataFrame(
        [(v,) for v in [-5, 0, 9, 10, 19, 99, 100, 250]], "v long"
    )
    got = {r["bucket"]: r["n"] for r in
           equi_width_histogram(df, "v", lo=0, hi=100, buckets=10).collect()}
    # -5 clamps into bucket 0; 100 and 250 clamp into bucket 9
    assert got == {0: 3, 1: 2, 9: 3}
    assert sum(got.values()) == 8


def test_blocklist_census_counts(spark):
    from osm_hadoop_spark.operators.curation import blocklist_census

    docs = spark.createDataFrame(
        [
            (1, "Spark spark SPARKLE"),        # 'spark' x3 (substring, ci)
            (2, "nothing to see"),
            (3, "aaa"),                         # 'aa' overlap: non-overlapping count = 1
        ],
        "doc_id long, text string",
    )
    got = {r["term"]: (r["n_docs"], r["n_occurrences"]) for r in
           blocklist_census(docs, ["spark", "aa", "absent"]).collect()}
    assert got["spark"] == (1, 3)
    # replace() consumes matches left-to-right, so 'aaa' counts ONE 'aa' —
    # the non-overlapping convention, identical in DuckDB's replace()
    assert got["aa"] == (1, 1)
    assert "absent" not in got


def test_media_context_windows_known(spark):
    from osm_hadoop_spark.operators.span_stats import media_context_windows

    def doc(doc_id, kinds):
        return (doc_id, [(k, None, None, i) for i, k in enumerate(kinds)])

    docs = spark.createDataFrame(
        [
            doc("a", ["text", "text", "media", "text", "osm.node"]),
            doc("b", ["media", "media"]),
            doc("c", ["text", "osm.node", "media"]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = sorted(
        (r["doc_id"], r["media_offset"], r["n_pre_text"], r["n_post_text"])
        for r in media_context_windows(docs).collect()
    )
    assert got == [
        ("a", 2, 2, 1),   # two text before, one text then osm.node after
        ("b", 0, 0, 0),   # adjacent media on both sides
        ("b", 1, 0, 0),
        ("c", 2, 0, 0),   # osm.node immediately before, end after
    ]


def test_media_context_no_shuffle(spark):
    from osm_hadoop_spark.operators.span_stats import media_context_windows

    docs = spark.createDataFrame(
        [("a", [("media", None, None, 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    plan = (
        media_context_windows(docs)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_sorted_neighborhood_finds_planted_dups(spark):
    from osm_hadoop_spark.operators.dedup import sorted_neighborhood_pairs

    texts = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
        (3, "completely different words here instead now"),
        (4, "alpha beta gamma delta epsilon eta"),    # near dup of 1/2
        (5, "unrelated text about other things entirely"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): (r["inter_n"], r["union_n"])
             for r in sorted_neighborhood_pairs(
                 docs, window=4, min_jaccard_pct=30).collect()}
    # exact duplicates share their ENTIRE shingle set, hence the same
    # blocking key and strip, hence sort-adjacency: guaranteed recall
    assert (1, 2) in pairs and pairs[(1, 2)][0] == pairs[(1, 2)][1]
    # precision: every emitted pair genuinely clears the gate (the verify
    # is exact, so no emitted pair can be below threshold)
    assert all(100 * i >= 30 * u for i, u in pairs.values())
    # (near-dup 4 is found only when its min shingle coincides with 1/2's
    # — the documented probabilistic-recall tradeoff of SNM blocking)


def test_sorted_neighborhood_candidates_linear(spark):
    """Candidate count before the gate is <= (window-1) * n, and the plan
    has no self-join (the neighborhood comes from lead over one sort)."""
    from osm_hadoop_spark.operators.dedup import sorted_neighborhood_pairs

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(40)],
        "doc_id long, text string",
    )
    out = sorted_neighborhood_pairs(docs, window=4, min_jaccard_pct=0)
    assert out.count() <= 3 * 40
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no self-join: lead() over the strip sort


def test_expectation_census_counts(spark):
    from osm_hadoop_spark.operators.profile import expectation_census

    df = spark.createDataFrame(
        [(1, 5, "A"), (2, -1, "A"), (2, 50, "X"), (3, None, "B")],
        "k long, v long, s string",
    )
    ref = spark.createDataFrame([(1,), (3,)], "k long")
    got = {r["check"]: r["n_violations"] for r in expectation_census(
        df,
        range_checks={"v": (0, 100)},
        domain_checks={"s": ["A", "B"]},
        unique_cols=["k"],
        ref_checks={"k": ref},
    ).collect()}
    assert got == {
        "range:v": 2,     # -1 out of range, NULL counts as violation
        "domain:s": 1,    # 'X'
        "unique:k": 1,    # k=2 twice -> one duplicate occurrence
        "ref:k": 2,       # both k=2 rows missing from the reference
    }
