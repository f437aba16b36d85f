"""Vocabulary growth + key-skew audit (operators/textstats.py)."""


def test_vocab_growth_hand(spark):
    from osm_hadoop_spark.operators.textstats import vocab_growth

    docs = spark.createDataFrame(
        [
            (0, "a b c"),       # bucket 0: introduces a, b, c
            (1, "a b d"),       # +d
            (2, "e"),           # bucket 1 (step=2): +e
            (3, "a e f"),       # +f
        ],
        "doc_id bigint, text string",
    )
    got = {r["k_docs"]: (r["new_tokens"], r["vocab_size"])
           for r in vocab_growth(docs, step=2).collect()}
    assert got == {2: (4, 4), 4: (2, 6)}


def test_vocab_growth_monotone_on_fixture(spark):
    from osm_hadoop_spark.operators.textstats import vocab_growth

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = vocab_growth(docs, step=200).orderBy("k_docs").collect()
    sizes = [r["vocab_size"] for r in rows]
    assert sizes == sorted(sizes)
    assert sizes[-1] == sum(r["new_tokens"] for r in rows)


def test_key_skew_audit_hand(spark):
    import pyspark.sql.functions as F

    from osm_hadoop_spark.operators.textstats import key_skew_audit

    rows = [("t", u) for u in [1, 1, 1, 1, 2]] + [("u", 9), ("u", 8)]
    df = spark.createDataFrame(rows, "event_type string, user_id bigint")
    got = {r["grp"]: r for r in
           key_skew_audit(df, "event_type", "user_id").collect()}
    t = got["t"]
    # group t: counts sorted (1@u2, 4@u1) -> gini_num = (2*1-2-1)*1
    # + (2*2-2-1)*4 = -1 + 4 = 3; den = 2*5 = 10 -> gini 0.3
    assert (t["n_keys"], t["total_rows"], t["top1_rows"]) == (2, 5, 4)
    assert (t["gini_num"], t["gini_den"]) == (3, 10)
    u = got["u"]
    # uniform group: gini 0
    assert (u["gini_num"], u["n_keys"], u["top1_rows"]) == (0, 2, 1)
