"""Exact moment matrix + PCA (operators/linalg.py): NumPy ground truth,
partial-merge invariance under repartitioning, eigenvector agreement."""

import numpy as np
import pytest


def _emb_df(spark, n=40, d=6, seed=7):
    rng = np.random.RandomState(seed)
    m = rng.uniform(-1, 1, size=(n, d)).astype(np.float32)
    rows = [(i, m[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>"),
        m,
    )


def _moments_dict(df):
    return {(r["i"], r["j"]): r["val"] for r in df.collect()}


def test_gram_matches_numpy(spark):
    from osm_hadoop_spark.operators.linalg import gram_moments

    df, m = _emb_df(spark)
    q = np.floor(m.astype(np.float64) * 1024).astype(np.int64)
    got = _moments_dict(gram_moments(df))
    g = q.T @ q
    s = q.sum(axis=0)
    d = m.shape[1]
    assert got[(-1, -1)] == m.shape[0]
    for j in range(d):
        assert got[(-1, j)] == s[j]
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == g[i, j]
    assert len(got) == d * (d + 1) // 2 + d + 1


def test_gram_invariant_under_partitioning(spark):
    """Partial-aggregation correctness: the merge law must make the result
    independent of how rows are batched into partitions."""
    from osm_hadoop_spark.operators.linalg import gram_moments

    df, _ = _emb_df(spark, n=33)
    a = _moments_dict(gram_moments(df.coalesce(1)))
    b = _moments_dict(gram_moments(df.repartition(7)))
    assert a == b


def test_pca_matches_eigh(spark):
    from osm_hadoop_spark.operators.linalg import gram_moments, pca_top_eigen

    # anisotropic data (dominant direction) so the eigen gap is wide and
    # power iteration converges within its fixed budget
    rng = np.random.RandomState(3)
    m = rng.uniform(-1, 1, size=(120, 5)).astype(np.float32)
    m[:, 2] *= 4.0
    rows = [(i, m[i].tolist()) for i in range(len(m))]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    v, eig = pca_top_eigen(gram_moments(df))
    q = np.floor(m.astype(np.float64) * 1024)
    cov = np.cov(q, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    # eigenvector defined up to sign
    assert min(np.linalg.norm(v - top), np.linalg.norm(v + top)) < 1e-6
    assert eig == pytest.approx(w[-1], rel=1e-9)


def test_shared_fit_and_projection(spark, tmp_path):
    """Engine fit (distributed moments) and oracle fit (NumPy over the
    parquet) must produce identical quantized directions, and the codegen
    projection must equal the NumPy integer dot products."""
    from osm_hadoop_spark.operators.linalg import (
        gram_moments, pca_directions_numpy, pca_directions_q, pca_project,
    )

    df, m = _emb_df(spark, n=80, d=6, seed=21)
    path = str(tmp_path / "emb.parquet")
    df.write.parquet(path)
    back = spark.read.parquet(path)

    d_engine = pca_directions_q(gram_moments(back), r=2)
    d_oracle = pca_directions_numpy(path, r=2)
    assert d_engine == d_oracle

    got = {r["vec_id"]: (r["pc1_q"], r["pc2_q"])
           for r in pca_project(back, d_engine).collect()}
    q = np.floor(m.astype(np.float64) * 1024).astype(np.int64)
    u = np.array(d_engine, dtype=np.int64)
    for r in range(len(m)):
        assert got[r] == (int(q[r] @ u[0]), int(q[r] @ u[1]))


def test_projection_plan_is_map_only(spark):
    from osm_hadoop_spark.operators.linalg import pca_project

    df, _ = _emb_df(spark, n=5, d=4)
    plan = (
        pca_project(df, [[1, 2, 3, 4], [4, 3, 2, 1]])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # no shuffle: broadcast-literal matmul
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
