"""Discrete Fréchet join (operators/frechet.py): vectorized/padded batch
kernel vs the textbook scalar recursion, metric sanity, blocking shape."""

import numpy as np


def test_batch_kernel_matches_scalar_reference():
    """Mixed trajectory lengths in ONE batch — proves padding never leaks
    into real cells."""
    import pandas as pd

    from osm_hadoop_spark.operators.frechet import _dp_batch, frechet_d2_py

    rng = np.random.RandomState(11)
    rows = []
    expected = []
    for k in range(60):
        m = rng.randint(2, 8)
        n = rng.randint(2, 8)
        a = [(int(x), int(y)) for x, y in rng.randint(-50, 50, size=(m, 2))]
        b = [(int(x), int(y)) for x, y in rng.randint(-50, 50, size=(n, 2))]
        rows.append(
            {
                "tid_a": k, "tid_b": 1000 + k,
                "axs": [p[0] for p in a], "ays": [p[1] for p in a],
                "bxs": [p[0] for p in b], "bys": [p[1] for p in b],
            }
        )
        expected.append(frechet_d2_py(a, b))
    out = _dp_batch(pd.DataFrame(rows))
    assert list(out["frechet_d2"]) == expected


def test_metric_properties():
    from osm_hadoop_spark.operators.frechet import frechet_d2_py

    a = [(0, 0), (10, 0), (20, 0)]
    assert frechet_d2_py(a, a) == 0
    b = [(0, 3), (10, 3), (20, 3)]
    # uniform offset by 3 -> frechet^2 = 9
    assert frechet_d2_py(a, b) == 9
    # symmetry
    c = [(0, 0), (5, 9), (20, 1), (7, 7)]
    assert frechet_d2_py(a, c) == frechet_d2_py(c, a)
    # frechet >= hausdorff-ish lower bound: at least the farthest endpoint
    assert frechet_d2_py(a, c) >= min(
        (a[-1][0] - c[-1][0]) ** 2 + (a[-1][1] - c[-1][1]) ** 2, 1
    )


def test_blocking_and_threshold(spark):
    from osm_hadoop_spark.operators.frechet import frechet_join

    rows = [
        (1, 0, 0, [0, 10], [0, 0]),
        (2, 0, 0, [0, 10], [2, 2]),   # close to 1 -> d2 = 4
        (3, 0, 0, [500, 510], [0, 0]),  # same cell, far away
        (4, 9, 9, [0, 10], [0, 0]),   # different cell: never a candidate
    ]
    traj = spark.createDataFrame(
        rows,
        "tid bigint, cellx bigint, celly bigint, "
        "xs array<bigint>, ys array<bigint>",
    )
    got = {(r["tid_a"], r["tid_b"]): r["frechet_d2"]
           for r in frechet_join(traj, tau_sq=100).collect()}
    assert got == {(1, 2): 4}
    all_pairs = {(r["tid_a"], r["tid_b"]): r["frechet_d2"]
                 for r in frechet_join(traj).collect()}
    # unthresholded: all same-cell pairs scored, cross-cell never generated
    assert set(all_pairs) == {(1, 2), (1, 3), (2, 3)}
