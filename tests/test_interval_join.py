"""interval_overlap_join: bucketized join must equal the naive nested
loop, pairs dedupe across shared buckets, half-open boundary semantics,
and the degenerate/cap guards."""

import numpy as np
import pytest

from osm_hadoop_spark.operators.interval_join import interval_overlap_join


def _dfs(spark, a_rows, b_rows):
    a = spark.createDataFrame(a_rows, "k bigint, a_id bigint, a_start bigint, a_end bigint")
    b = spark.createDataFrame(b_rows, "k bigint, b_id bigint, b_start bigint, b_end bigint")
    return a, b


def _pairs(a, b, **kw):
    out = interval_overlap_join(a, b, on="k", **kw)
    return sorted((r["a_id"], r["b_id"]) for r in out.collect())


def test_half_open_touching_does_not_overlap(spark):
    a, b = _dfs(spark, [(1, 0, 0, 100)], [(1, 0, 100, 200), (1, 1, 99, 200)])
    assert _pairs(a, b, bucket_width=50) == [(0, 1)]


def test_pair_spanning_many_shared_buckets_emitted_once(spark):
    # both intervals cover buckets 0..9 with width 10
    a, b = _dfs(spark, [(1, 5, 0, 100)], [(1, 7, 1, 99)])
    assert _pairs(a, b, bucket_width=10) == [(5, 7)]


def test_zero_length_and_oversized_intervals_dropped(spark):
    a, b = _dfs(
        spark,
        [(1, 0, 50, 50), (1, 1, 0, 10_000_000)],
        [(1, 0, 0, 1_000_000)],
    )
    # a_id=0 zero-length; a_id=1 spans 1000 buckets > cap 100
    assert _pairs(a, b, bucket_width=10_000, max_buckets_per_interval=100) == []
    # with a generous cap the long interval matches
    assert _pairs(a, b, bucket_width=10_000, max_buckets_per_interval=10_000) == [(1, 0)]


def test_key_isolation(spark):
    a, b = _dfs(spark, [(1, 0, 0, 100)], [(2, 0, 0, 100)])
    assert _pairs(a, b, bucket_width=50) == []


def test_overlapping_column_names_rejected(spark):
    a, b = _dfs(spark, [], [])
    with pytest.raises(ValueError):
        interval_overlap_join(a, b.withColumnRenamed("b_id", "a_id"), on="k")


@pytest.mark.parametrize("seed,width", [(0, 7), (1, 100), (2, 1000)])
def test_random_matches_bruteforce(spark, seed, width):
    rng = np.random.default_rng(seed)
    n = 150
    def gen(prefix):
        k = rng.integers(0, 6, n)
        s = rng.integers(0, 5000, n)
        ln = rng.integers(1, 400, n)
        return [(int(k[i]), i, int(s[i]), int(s[i] + ln[i])) for i in range(n)]
    ar, br = gen("a"), gen("b")
    a, b = _dfs(spark, ar, br)
    got = _pairs(a, b, bucket_width=width)
    want = sorted(
        (ai, bi)
        for (ak, ai, as_, ae) in ar
        for (bk, bi, bs, be) in br
        if ak == bk and as_ < be and bs < ae
    )
    assert got == want
