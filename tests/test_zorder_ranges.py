"""Z-order range decomposition (functions/hilbert.py zorder_ranges):
exact-cover enumeration proof, merge/disjoint invariants, and scan
pushdown of the range predicate."""

import itertools
import os

from pyspark.sql import functions as F

from osm_hadoop_spark.functions.hilbert import (
    zorder_key,
    zorder_range_predicate,
    zorder_ranges,
)


def _brute_zset(x0, x1, y0, y1, order):
    def z(x, y):
        out = 0
        for i in range(order):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    return {
        z(x, y)
        for x in range(x0, x1 + 1)
        for y in range(y0, y1 + 1)
    }


def test_exact_cover_enumeration():
    order = 5
    boxes = [
        (0, 31, 0, 31),          # whole grid -> one range
        (0, 0, 0, 0),            # single cell
        (3, 17, 5, 29),          # generic
        (16, 16, 0, 31),         # 1-wide column crossing the midline
        (7, 8, 7, 8),            # 2x2 straddling every level boundary
    ]
    for x0, x1, y0, y1 in boxes:
        ranges = zorder_ranges(x0, x1, y0, y1, order)
        covered = set(
            itertools.chain.from_iterable(range(lo, hi + 1) for lo, hi in ranges)
        )
        assert covered == _brute_zset(x0, x1, y0, y1, order), (x0, x1, y0, y1)
        # sorted, disjoint, maximally merged
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a1 < b0 and a1 + 1 < b0, ranges
    assert zorder_ranges(0, 31, 0, 31, 5) == [(0, 1023)]


def test_range_count_stays_small():
    # O(order * perimeter) bound in practice: a 100x100 box at order 10
    # should need far fewer intervals than its 10^4 cells
    ranges = zorder_ranges(100, 199, 300, 399, 10)
    assert len(ranges) < 400


def test_predicate_matches_bbox_filter(spark, tmp_path):
    order = 7
    n = 1 << order
    pts = spark.range(4000).select(
        F.col("id").alias("pid"),
        (F.col("id") * 2654435761 % n).alias("x"),
        (F.col("id") * 40503 % n).alias("y"),
    ).withColumn("zkey", zorder_key(F.col("x"), F.col("y"), order))
    path = os.path.join(str(tmp_path), "zlayout")
    pts.repartitionByRange(4, "zkey").sortWithinPartitions("zkey").write.parquet(path)

    df = spark.read.parquet(path)
    x0, x1, y0, y1 = 10, 90, 33, 77
    ranges = zorder_ranges(x0, x1, y0, y1, order)
    got = df.filter(zorder_range_predicate(F.col("zkey"), ranges))
    want = df.filter(
        (F.col("x") >= x0) & (F.col("x") <= x1)
        & (F.col("y") >= y0) & (F.col("y") <= y1)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the range predicate reaches the parquet scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "zkey" in plan.split("PushedFilters")[1][:2000]


def test_join_and_exists_forms_equivalent_on_computed_key(spark):
    # both computed-key forms must select exactly the bbox even with
    # hundreds of intervals (the regime that OOMed the OR-chain codegen)
    from osm_hadoop_spark.functions.hilbert import (
        zorder_exists_predicate,
        zorder_range_join,
    )

    order = 8
    n = 1 << order
    pts = spark.range(3000).select(
        F.col("id").alias("pid"),
        (F.col("id") * 48271 % n).alias("x"),
        (F.col("id") * 16807 % n).alias("y"),
    ).withColumn("zkey", zorder_key(F.col("x"), F.col("y"), order))
    x0, x1, y0, y1 = 37, 201, 90, 166
    ranges = zorder_ranges(x0, x1, y0, y1, order)
    assert len(ranges) > 100
    want = sorted(map(tuple, pts.filter(
        (F.col("x") >= x0) & (F.col("x") <= x1)
        & (F.col("y") >= y0) & (F.col("y") <= y1)
    ).collect()))
    got_join = zorder_range_join(pts, F.col("zkey"), ranges)
    assert sorted(map(tuple, got_join.collect())) == want
    got_exists = pts.filter(
        zorder_exists_predicate(F.col("zkey"), ranges[:8])
    ).filter(
        (F.col("x") >= x0) & (F.col("x") <= x1)
        & (F.col("y") >= y0) & (F.col("y") <= y1)
    )
    # exists form (small list, doc'd slow path) stays a correct predicate
    sub = {t[0] for t in got_exists.collect()}
    assert sub <= {t[0] for t in want}


def test_empty_and_invalid():
    import pytest

    with pytest.raises(ValueError):
        zorder_ranges(0, 32, 0, 0, 5)
    assert zorder_range_predicate(F.col("k"), [])._jc is not None
