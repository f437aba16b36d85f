"""OOV census (operators/textstats.py): vocabulary cut determinism,
counts, empty docs."""

from osm_hadoop_spark.operators.textstats import oov_census


def test_counts_and_cut(spark):
    docs = [
        (1, "a a a b b c"),     # a:3(+2 below)=..., counts across corpus
        (2, "a b c d"),
        (3, "d e"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # corpus counts: a:4, b:3, c:2, d:2, e:1 -> vocab_size=3 keeps
    # a, b and then the (count DESC, token ASC) tie-break keeps c over d
    got = {r.doc_id: (r.n_tokens, r.n_oov)
           for r in oov_census(df, 3).collect()}
    assert got[1] == (6, 0)
    assert got[2] == (4, 1)   # d is OOV
    assert got[3] == (2, 2)   # d, e OOV
    assert got[4] == (0, 0)


def test_vocab_covers_all(spark):
    docs = [(1, "x y"), (2, "y z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.n_oov for r in oov_census(df, 100).collect()}
    assert got == {1: 0, 2: 0}
