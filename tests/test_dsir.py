"""DSIR importance resampling: planted-domain selection semantics."""

import pyspark.sql.functions as F


def _corpus(spark):
    # target exemplars (doc_id % 7 == 0) speak "legal"; half the raw pool
    # does too, the other half speaks unrelated "weather" filler.
    legal = "the court held that the statute requires strict liability"
    weather = "light rain tomorrow with gusty winds across the valley floor"
    rows = []
    for i in range(60):
        if i % 7 == 0:
            rows.append((i, legal + f" case {chr(97 + i % 5)}"))
        elif i % 2 == 0:
            rows.append((i, legal + f" appeal {chr(97 + i % 3)}"))
        else:
            rows.append((i, weather + f" zone {chr(97 + i % 3)}"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_dsir_selects_target_like_docs(spark):
    from osm_hadoop_spark.operators.dsir import dsir_select

    docs = _corpus(spark)
    top = dsir_select(docs, target_mod=7, n_buckets=512, k=10).collect()
    assert len(top) == 10
    # every selected doc is raw-pool (never a target exemplar)
    assert all(r.doc_id % 7 != 0 for r in top)
    # and every one is from the planted legal-like half
    assert all(r.doc_id % 2 == 0 for r in top), [r.doc_id for r in top]
    # deterministic ordering: score desc, doc_id asc
    keys = [(-r.score, r.doc_id) for r in top]
    assert keys == sorted(keys)


def test_dsir_scores_monotone_in_target_overlap(spark):
    from osm_hadoop_spark.operators.dsir import dsir_scores

    docs = _corpus(spark)
    sc = {
        r.doc_id: r.score
        for r in dsir_scores(
            docs, F.col("doc_id") % 7 == 0, n_buckets=512
        ).collect()
    }
    legal_like = min(v for k, v in sc.items() if k % 2 == 0)
    weather = max(v for k, v in sc.items() if k % 2 == 1)
    assert legal_like > weather
