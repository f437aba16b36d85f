"""Fellegi-Sunter linkage (operators/linkage.py) vs brute + guard."""

from __future__ import annotations

import pytest

FIELDS = [("name", 24, 12), ("city", 16, 8), ("band", 8, 4)]


def _brute(a_rows, b_rows, th):
    out = {}
    for aid, an, ac, ab in a_rows:
        for bid, bn, bc, bb in b_rows:
            s = (24 if an == bn else -12) + (16 if ac == bc else -8) + (
                8 if ab == bb else -4
            )
            if s >= th:
                out[(aid, bid)] = s
    return out


def test_fs_link_matches_brute(spark):
    from osm_hadoop_spark.operators.linkage import fs_link

    a_rows = [(i, i % 7, i % 5, i % 3) for i in range(60)]
    b_rows = [
        (100 + i, (i + (1 if i % 4 == 0 else 0)) % 7, i % 5,
         (i + (1 if i % 3 == 0 else 0)) % 3)
        for i in range(60)
    ]
    a = spark.createDataFrame(a_rows, "a_id long, name long, city long, band long")
    b = spark.createDataFrame(b_rows, "b_id long, name long, city long, band long")
    got = {
        (r["a_id"], r["b_id"]): r["score"]
        for r in fs_link(a, b, FIELDS, "city", 28).collect()
    }
    assert got == _brute(a_rows, b_rows, 28)
    assert got  # fixture produces matches


def test_fs_link_rejects_lossy_blocking(spark):
    from osm_hadoop_spark.operators.linkage import fs_link

    a = spark.createDataFrame([(1, 1, 1, 1)], "a_id long, name long, city long, band long")
    # threshold 20: name+band alone reach 24 - 8 = 24 >= 20 with city
    # disagreeing -> blocking on city would lose pairs; must refuse.
    with pytest.raises(ValueError, match="lossy blocking"):
        fs_link(a, a.withColumnRenamed("a_id", "b_id"), FIELDS, "city", 20)
    with pytest.raises(ValueError, match="not in fields"):
        fs_link(a, a.withColumnRenamed("a_id", "b_id"), FIELDS, "zip", 28)


def test_fs_link_threshold_boundary(spark):
    from osm_hadoop_spark.operators.linkage import fs_link

    a = spark.createDataFrame(
        [(1, 10, 20, 30)], "a_id long, name long, city long, band long"
    )
    b = spark.createDataFrame(
        [(2, 10, 20, 31), (3, 11, 20, 31)],
        "b_id long, name long, city long, band long",
    )
    # (1,2): 24+16-4 = 36 >= 28 kept; (1,3): -12+16-4 = 0 dropped
    got = {(r["a_id"], r["b_id"]): r["score"]
           for r in fs_link(a, b, FIELDS, "city", 28).collect()}
    assert got == {(1, 2): 36}
