"""Integral image + box sums (operators/focal.py): numpy cumsum
replay, inclusion-exclusion correctness incl. edge boxes."""

import random

import numpy as np

from osm_hadoop_spark.operators.focal import box_sums, integral_image


def _grid(spark, arr):
    rows = [
        (x, y, int(arr[y, x]))
        for y in range(arr.shape[0])
        for x in range(arr.shape[1])
    ]
    return spark.createDataFrame(rows, "x long, y long, v long")


def test_matches_numpy_cumsum(spark):
    rng = np.random.RandomState(17)
    arr = rng.randint(-5, 20, size=(9, 13))
    got = {
        (r.x, r.y): r.sat for r in integral_image(_grid(spark, arr)).collect()
    }
    sat = arr.cumsum(axis=0).cumsum(axis=1)
    for y in range(arr.shape[0]):
        for x in range(arr.shape[1]):
            assert got[(x, y)] == sat[y, x]


def test_box_sums_inclusion_exclusion(spark):
    rng = np.random.RandomState(23)
    arr = rng.randint(0, 50, size=(12, 12))
    sat = integral_image(_grid(spark, arr))
    pyrng = random.Random(5)
    boxes = []
    for i in range(20):
        x0, y0 = pyrng.randint(0, 11), pyrng.randint(0, 11)
        x1, y1 = pyrng.randint(x0, 11), pyrng.randint(y0, 11)
        boxes.append((i, x0, y0, x1, y1))
    boxes.append((99, 0, 0, 11, 11))  # whole-lattice edge case
    bdf = spark.createDataFrame(
        boxes, "box_id long, x0 long, y0 long, x1 long, y1 long"
    )
    got = {r.box_id: r.total for r in box_sums(sat, bdf).collect()}
    for bid, x0, y0, x1, y1 in boxes:
        assert got[bid] == int(arr[y0 : y1 + 1, x0 : x1 + 1].sum())
