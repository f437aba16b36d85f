"""Greedy max-coverage selection (operators/selection.py): brute-force
greedy agreement, early stop, marginal-gain monotonicity."""


import pytest


@pytest.fixture(scope="module")
def doc_grams(spark):
    import random

    rng = random.Random(17)
    rows = [(d, rng.randrange(400)) for d in range(60) for _ in range(30)]
    return spark.createDataFrame(
        sorted(set(rows)), "doc_id bigint, gram bigint"
    ).cache()


def _grams(spark, mapping):
    rows = [(d, g) for d, gs in mapping.items() for g in gs]
    return spark.createDataFrame(rows, "doc_id bigint, gram bigint")


def test_matches_brute_force_greedy(spark):
    from osm_hadoop_spark.operators.selection import greedy_cover

    mapping = {
        1: {10, 11, 12, 13},
        2: {10, 11, 14},
        3: {20, 21},
        4: {12, 13, 20, 21, 22},   # best first pick (5 grams)
        5: {30},
    }
    got = [(r["sel_round"], r["doc_id"], r["n_new_grams"])
           for r in greedy_cover(_grams(spark, mapping), k=10)
           .orderBy("sel_round").collect()]

    # brute-force greedy reference
    covered, sel, exp = set(), set(), []
    for r in range(10):
        best = None
        for d, gs in mapping.items():
            if d in sel:
                continue
            gain = len(gs - covered)
            if gain > 0 and (best is None or gain > best[1]
                             or (gain == best[1] and d < best[0])):
                best = (d, gain)
        if best is None:
            break
        exp.append((r, best[0], best[1]))
        sel.add(best[0])
        covered |= mapping[best[0]]
    assert got == exp
    # early stop: every gram covered before k rounds exhausts the ladder
    assert len(got) < 10
    # submodularity: marginal gains are non-increasing
    gains = [g for _, _, g in got]
    assert gains == sorted(gains, reverse=True)


def test_stochastic_frac1_equals_exact(spark, doc_grams):
    from osm_hadoop_spark.operators.selection import (
        greedy_cover,
        stochastic_greedy_cover,
    )

    exact = [tuple(r) for r in greedy_cover(doc_grams, k=5).collect()]
    st = [tuple(r) for r in
          stochastic_greedy_cover(doc_grams, k=5, sample_frac=1.0).collect()]
    assert st == exact


def test_stochastic_sampled_quality_and_validity(spark, doc_grams):
    """Sampled run must produce a VALID ladder (strictly positive true
    gains, no repeated docs) with total coverage within the stochastic
    guarantee's ballpark of exact greedy on the fixture."""
    from osm_hadoop_spark.operators.selection import (
        greedy_cover,
        stochastic_greedy_cover,
    )

    exact = greedy_cover(doc_grams, k=5).collect()
    st = stochastic_greedy_cover(doc_grams, k=5, sample_frac=0.5).collect()
    docs = [r["doc_id"] for r in st]
    assert len(set(docs)) == len(docs)
    assert all(r["n_new_grams"] > 0 for r in st)
    cov_exact = sum(r["n_new_grams"] for r in exact)
    cov_st = sum(r["n_new_grams"] for r in st)
    assert cov_st >= 0.8 * cov_exact
