"""KMV sketches (operators/sketch.py kmv_sketch/kmv_overlap): exactness
when k covers the union, estimator accuracy when it doesn't, and
determinism."""

from pyspark.sql import Row

from osm_hadoop_spark.operators.sketch import kmv_overlap, kmv_sketch


def _df(spark, sets):
    rows = [Row(g=g, v=v) for g, vals in sets.items() for v in vals]
    return spark.createDataFrame(rows)


def test_exact_when_k_covers_union(spark):
    sets = {
        "A": list(range(10)),
        "B": list(range(6, 16)),     # |A n B| = 4, |A u B| = 16
        "C": list(range(100, 105)),  # disjoint from both
    }
    sk = kmv_sketch(_df(spark, sets), "g", "v", k=64)
    out = {(r["ga"], r["gb"]): r for r in kmv_overlap(sk, "g", k=64).collect()}
    ab = out[("A", "B")]
    assert (ab["inter_k"], ab["union_k"]) == (4, 16)
    ac = out[("A", "C")]
    assert (ac["inter_k"], ac["union_k"]) == (0, 15)
    assert len(out) == 3  # all unordered pairs


def test_estimator_accuracy_under_sampling(spark):
    # two 600-element sets sharing 300: true jaccard = 300/900 = 1/3
    a = set(range(600))
    b = set(range(300, 900))
    sk = kmv_sketch(_df(spark, {"A": a, "B": b}), "g", "v", k=128)
    r = kmv_overlap(sk, "g", k=128).collect()[0]
    jacc = r["inter_k"] / r["union_k"]
    assert abs(jacc - 1 / 3) < 0.15
    # distinct-union estimate (k-1) * 2^60 / kth within 30%
    est = (r["union_k"] - 1) * (1 << 60) / r["kth_union"]
    assert abs(est - 900) / 900 < 0.3
    assert r["union_k"] == 128  # sampling regime: sketch full


def test_duplicates_ignored_and_deterministic(spark):
    base = {"A": [1, 2, 3], "B": [2, 3, 4]}
    dup = {"A": [1, 2, 3] * 5, "B": [2, 3, 4, 2, 3]}
    sk1 = kmv_sketch(_df(spark, base), "g", "v", k=8)
    sk2 = kmv_sketch(_df(spark, dup).repartition(7), "g", "v", k=8)
    r1 = sorted(map(tuple, kmv_overlap(sk1, "g", k=8).collect()))
    r2 = sorted(map(tuple, kmv_overlap(sk2, "g", k=8).collect()))
    assert r1 == r2
    assert r1[0][3] == 2 and r1[0][4] == 4  # inter=2 (of {2,3}), union=4
