"""Chi-square token drift (textstats.token_drift_chi2): hand-computed 2x2
values on a tiny corpus, and the single-scan plan shape."""

from fractions import Fraction

import pyspark.sql.functions as F


def test_chi2_hand_computed(spark):
    from osm_hadoop_spark.operators.textstats import token_drift_chi2

    docs = spark.createDataFrame(
        [
            (1, "en", "cat cat dog"),
            (2, "en", "cat bird"),
            (3, "fr", "dog dog bird"),
            (4, "fr", "bird bird"),
        ],
        "doc_id bigint, lang string, text string",
    )
    out = token_drift_chi2(docs, F.col("lang") == "en", min_total=1)
    got = {r["token"]: r for r in out.collect()}
    # corpus: N=10 tokens, Na=5 in slice
    # cat: a=3 b=0 c=2 d=5 -> delta=15, num=10*225=2250, den=3*7*5*5=525
    r = got["cat"]
    assert (r["a"], r["b"]) == (3, 0)
    assert (int(r["chi2_num"]), int(r["chi2_den"])) == (2250, 525)
    # chi2 = 30/7 per the textbook formula
    assert Fraction(int(r["chi2_num"]), int(r["chi2_den"])) == Fraction(30, 7)
    # bird: a=1 b=3 -> c=4 d=2, delta=1*2-3*4=-10, num=10*100=1000,
    # den=4*6*5*5=600
    r = got["bird"]
    assert (r["a"], r["b"]) == (1, 3)
    assert (int(r["chi2_num"]), int(r["chi2_den"])) == (1000, 600)
    # dog: a=1 b=2 c=4 d=3 -> delta=3-8=-5, num=10*25=250, den=3*7*5*5
    r = got["dog"]
    assert (int(r["chi2_num"]), int(r["chi2_den"])) == (250, 525)


def test_chi2_single_token_scan(spark):
    """The corpus totals must come from the materialized per-token census,
    not a second scan+explode of the corpus: the final plan reads the
    checkpointed census on BOTH branches (zero Generate nodes) and joins
    the one-row totals via broadcast."""
    from osm_hadoop_spark.operators.textstats import token_drift_chi2

    docs = spark.createDataFrame(
        [(1, "en", "a b"), (2, "fr", "b c")],
        "doc_id bigint, lang string, text string",
    )
    plan = (
        token_drift_chi2(docs, F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Generate") == 0  # corpus explode ran exactly once
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
