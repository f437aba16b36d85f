"""NW alignment (operators/align.py): batch kernel vs scalar recursion,
classic hand cases, padding safety with mixed lengths."""

import numpy as np


def test_hand_cases():
    from osm_hadoop_spark.operators.align import nw_score_py

    # identical: all matches
    assert nw_score_py([1, 2, 3], [1, 2, 3]) == 6
    # one substitution beats gaps: match+mismatch+match = 2-1+2
    assert nw_score_py([1, 2, 3], [1, 9, 3]) == 3
    # pure insertion: 3 matches + 1 gap
    assert nw_score_py([1, 2, 3], [1, 2, 7, 3]) == 5
    # disjoint: best is all mismatches (-3) vs gaps (-6)
    assert nw_score_py([1, 2, 3], [4, 5, 6]) == -3
    # empty vs k tokens: k gaps
    assert nw_score_py([], [1, 2]) == -2


def test_batch_kernel_matches_scalar():
    import pandas as pd

    from osm_hadoop_spark.operators.align import _nw_batch, nw_score_py

    rng = np.random.RandomState(3)
    rows, exp = [], []
    for k in range(50):
        m, n = rng.randint(1, 12), rng.randint(1, 12)
        a = rng.randint(0, 6, size=m).tolist()  # small alphabet -> matches
        b = rng.randint(0, 6, size=n).tolist()
        rows.append({"doc_a": k, "doc_b": 100 + k, "ta": a, "tb": b})
        exp.append(nw_score_py(a, b))
    out = _nw_batch(pd.DataFrame(rows))
    assert list(out["align_score"]) == exp


def test_spark_path(spark):
    from osm_hadoop_spark.operators.align import nw_align

    pairs = spark.createDataFrame(
        [(1, 2, [1, 2, 3], [1, 9, 3]), (3, 4, [5], [5])],
        "doc_a bigint, doc_b bigint, ta array<bigint>, tb array<bigint>",
    )
    got = {(r["doc_a"], r["doc_b"]): r["align_score"]
           for r in nw_align(pairs).collect()}
    assert got == {(1, 2): 3, (3, 4): 2}
