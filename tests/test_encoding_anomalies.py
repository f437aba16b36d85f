"""Encoding-anomaly census (operators/textstats.py): counter exactness
on crafted mojibake, clean-text zeros, and tab/newline exemption."""

from osm_hadoop_spark.operators.textstats import encoding_anomalies


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r for r in encoding_anomalies(df).collect()}


def test_counters_exact(spark):
    docs = [
        (1, "clean ascii text, nothing to see"),
        (2, "bad � char and another �"),
        (3, "cafÃ© voilÃ "),          # 'Ã©' 'Ã ' win-mojibake
        (4, "itâ€™s â€œquotedâ€"),  # â€™ â€œ â€?
        (5, "null\x00byte and bell\x07"),
    ]
    got = _run(spark, docs)
    assert (got[1].n_fffd, got[1].n_winmoji, got[1].n_sqmoji,
            got[1].n_ctrl, got[1].flagged) == (0, 0, 0, 0, False)
    assert got[2].n_fffd == 2 and got[2].flagged
    assert got[3].n_winmoji == 2 and got[3].n_fffd == 0
    assert got[4].n_sqmoji == 3
    assert got[5].n_ctrl == 2 and got[5].flagged


def test_tab_newline_cr_exempt(spark):
    got = _run(spark, [(1, "a\tb\nc\rd")])
    assert got[1].n_ctrl == 0 and not got[1].flagged


def test_empty_text(spark):
    got = _run(spark, [(1, "")])
    assert (got[1].n_fffd, got[1].n_ctrl, got[1].flagged) == (0, 0, False)
