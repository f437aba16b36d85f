"""SQ8 symmetric scalar quantization: quantizer range/determinism,
zero-corpus guard, and recall of the quantized ranking vs brute force."""

import numpy as np
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.similarity import (
    brute_force_topk,
    sq8_quantize_col,
    sq8_scale,
    sq8_topk,
)


def _emb_df(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id bigint, embedding array<float>",
    )


def _quantized(spark, x):
    emb = _emb_df(spark, x)
    rows = (
        emb.crossJoin(F.broadcast(sq8_scale(emb)))
        .select("vec_id", sq8_quantize_col("embedding").alias("q"))
        .collect()
    )
    return np.array([r["q"] for r in sorted(rows, key=lambda r: r["vec_id"])])


def test_quantizer_symmetric_range(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    qm = _quantized(spark, x)
    assert -127 <= qm.min() and qm.max() <= 127
    xa = x.astype(np.float64)
    flat = np.abs(xa).ravel()
    # the absmax element quantizes to +-127
    i = int(np.argmax(flat))
    assert abs(qm.ravel()[i]) == 127
    # sign preserved wherever |x| is above half a quantization step
    step = flat.max() / 127
    big = np.abs(xa) > step
    assert np.all(np.sign(qm[big]) == np.sign(xa[big]))


def test_all_zero_corpus_quantizes_to_zero(spark):
    qm = _quantized(spark, np.zeros((4, 4), dtype=np.float32))
    assert np.all(qm == 0)


def test_recall_vs_brute_force(spark):
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 32))
    x = centers[rng.integers(0, 8, 400)] + 0.15 * rng.normal(size=(400, 32))
    x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    emb = _emb_df(spark, x)
    queries = emb.filter(F.col("vec_id") % 80 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    exact = brute_force_topk(emb, queries, k=20).collect()
    quant = sq8_topk(emb, queries, k=10, dim=32).collect()
    want, got = {}, {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in quant:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    # within a tight cluster the exact top-10 are near-ties (cosine gaps
    # below one int8 quantization step), so plain recall@10 punishes tie
    # shuffling; the meaningful guarantee is containment: everything the
    # quantized ranking returns is a true near neighbor (exact top-20)
    containment = [len(want[q] & got[q]) / 10 for q in want]
    assert np.mean(containment) >= 0.9, containment


def test_scores_are_integers_and_ranked(spark):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(60, 16)).astype(np.float32)
    emb = _emb_df(spark, x)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    rows = sq8_topk(emb, queries, k=5, dim=16).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    scores = [r["qscore"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(isinstance(s, int) for s in scores)
    assert all(r["vec_id"] != 0 for r in rows)  # self excluded
