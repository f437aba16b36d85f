"""Hilbert keys (functions/hilbert.py) vs the independent textbook xy2d.

The brute force is the classic while-loop xy2d (Hacker's Delight /
Wikipedia formulation) sharing no code with the column expression. The
adjacency test is the defining property of the curve — consecutive
indices are Manhattan-distance-1 neighbours — checked by FULL
enumeration of the order-5 grid (1024 cells), which a Z-order key
provably fails (also asserted, so the two keys can't be swapped).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _xy2d(order: int, x: int, y: int) -> int:
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _zorder(order: int, x: int, y: int) -> int:
    d = 0
    for i in range(order):
        d |= ((x >> i) & 1) << (2 * i)
        d |= ((y >> i) & 1) << (2 * i + 1)
    return d


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def test_hilbert_matches_textbook_xy2d(spark):
    from osm_hadoop_spark.functions.hilbert import hilbert_key, zorder_key

    order = 9
    n = 1 << order
    pts = [(i, _h(f"hx{i}", n), _h(f"hy{i}", n)) for i in range(500)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        r["id"]: (r["h"], r["z"])
        for r in df.select(
            "id",
            hilbert_key(F.col("x"), F.col("y"), order).alias("h"),
            zorder_key(F.col("x"), F.col("y"), order).alias("z"),
        ).collect()
    }
    for i, x, y in pts:
        assert got[i] == (_xy2d(order, x, y), _zorder(order, x, y))


def test_hilbert_full_grid_bijective_and_adjacent(spark):
    from osm_hadoop_spark.functions.hilbert import hilbert_key, zorder_key

    order = 5
    n = 1 << order
    cells = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(cells, "x long, y long")
    rows = df.select(
        "x",
        "y",
        hilbert_key(F.col("x"), F.col("y"), order).alias("h"),
        zorder_key(F.col("x"), F.col("y"), order).alias("z"),
    ).collect()
    by_h = sorted((r["h"], r["x"], r["y"]) for r in rows)
    # bijective onto [0, 4^order)
    assert [t[0] for t in by_h] == list(range(n * n))
    # defining property: consecutive Hilbert cells are 4-neighbours
    for (_, x0, y0), (_, x1, y1) in zip(by_h, by_h[1:]):
        assert abs(x1 - x0) + abs(y1 - y0) == 1
    # ... which Z-order does NOT satisfy (quadrant-boundary jumps)
    by_z = sorted((r["z"], r["x"], r["y"]) for r in rows)
    jumps = sum(
        abs(x1 - x0) + abs(y1 - y0) != 1
        for (_, x0, y0), (_, x1, y1) in zip(by_z, by_z[1:])
    )
    assert jumps > 0


def test_hilbert_key_is_one_jvm_projection(spark):
    from osm_hadoop_spark.functions.hilbert import hilbert_key

    df = spark.createDataFrame([(3, 5)], "x long, y long")
    out = df.select(hilbert_key(F.col("x"), F.col("y"), 8).alias("h"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_layout_by_hilbert_prunes_better_than_zorder(spark):
    """The point of the layout op: per-file bounding boxes are compact.

    Range-partition the same 4096 uniform points 12 ways by Hilbert key
    and by Z key; the summed per-file bbox semiperimeter (what parquet
    min/max pruning sees) must be strictly smaller for Hilbert. 12 (not
    a power of 4) so file ranges straddle quadrant boundaries — at 16
    both curves happen to split into perfect 16x16 blocks and tie.
    """
    from osm_hadoop_spark.functions.hilbert import layout_by_hilbert, zorder_key

    order, files = 6, 12
    n = 1 << order
    cells = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(cells, "x long, y long")

    def spread(laid):
        sizes = (
            laid.groupBy(F.spark_partition_id().alias("p"))
            .agg(
                (F.max("x") - F.min("x") + F.max("y") - F.min("y")).alias("sp")
            )
            .collect()
        )
        assert len(sizes) == files
        return sum(r["sp"] for r in sizes)

    hil = layout_by_hilbert(df, F.col("x"), F.col("y"), order, files)
    zor = (
        df.withColumn("_zk", zorder_key(F.col("x"), F.col("y"), order))
        .repartitionByRange(files, "_zk")
        .sortWithinPartitions("_zk")
    )
    plan = hil._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" in plan
    assert spread(hil) < spread(zor)
