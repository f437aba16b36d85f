"""bitext_margin_mine (operators/similarity.py): planted-pair recall,
hub suppression (the margin's reason to exist), guards, determinism."""

import numpy as np
from pyspark.sql import Row

from osm_hadoop_spark.operators.similarity import bitext_margin_mine


def _mk(spark, rows, idc):
    return spark.createDataFrame([Row(**{idc: i, "embedding": e}) for i, e in rows])


def test_planted_translations_mined(spark):
    rng = np.random.RandomState(7)
    a_rows = [(i, (rng.randn(16) / 4).tolist()) for i in range(20)]
    # translations: tiny perturbation of a subset
    b_rows = [(100 + i, [x + 0.01 for x in e]) for i, e in a_rows[:8]]
    out = bitext_margin_mine(
        _mk(spark, a_rows, "a_id"), _mk(spark, b_rows, "b_id"), k=3
    ).collect()
    mined = {(r["a_id"], r["b_id"]) for r in out}
    for i in range(8):
        assert (i, 100 + i) in mined


def test_ambiguous_cluster_suppressed_unique_survives(spark):
    # two-sided ambiguity: a0/a1 are identical, b100/b101 are identical
    # copies of them — every cross score in the cluster ties, so for k=2
    # margin = 2k*s / (2s + 2s) = 1 < 1.06 and NOTHING in the cluster
    # mines. The unique pair (a5, b200) has fwd = bwd = s, margin =
    # 2k*s / 2s = k = 2 > 1.06 and mines. Same raw dot in both cases:
    # this is exactly the hubness/ambiguity failure a plain threshold
    # cannot separate and the ratio margin exists to fix.
    base = [1.0] + [0.0] * 15
    other = [0.0] * 8 + [1.0] + [0.0] * 7
    a_rows = [(0, base), (1, base), (5, other)]
    b_rows = [(100, base), (101, base), (200, other)]
    out = bitext_margin_mine(
        _mk(spark, a_rows, "a_id"), _mk(spark, b_rows, "b_id"),
        k=2, tau_num=106, tau_den=100,
    ).collect()
    mined = {(r["a_id"], r["b_id"]) for r in out}
    assert (5, 200) in mined
    assert not any(b in (100, 101) for _, b in mined)


def test_antiparallel_never_mined(spark):
    a_rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    b_rows = [(100, [-1.0, 0.0]), (101, [0.0, -1.0])]
    out = bitext_margin_mine(
        _mk(spark, a_rows, "a_id"), _mk(spark, b_rows, "b_id"), k=1
    ).collect()
    assert out == []


def test_layout_invariance(spark):
    rng = np.random.RandomState(3)
    a_rows = [(i, (rng.randn(8) / 4).tolist()) for i in range(30)]
    b_rows = [(100 + i, [x + 0.02 for x in e]) for i, e in a_rows[::3]]
    a, b = _mk(spark, a_rows, "a_id"), _mk(spark, b_rows, "b_id")
    r1 = sorted(map(tuple, bitext_margin_mine(a, b, k=3).collect()))
    r2 = sorted(
        map(tuple, bitext_margin_mine(a.repartition(5), b.coalesce(1), k=3).collect())
    )
    assert r1 == r2
