"""Greedy max-coverage selection (operators/selection.py): brute-force
greedy agreement, early stop, marginal-gain monotonicity."""


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
