"""Allen interval-algebra census (operators/allen.py): brute-force
classification replay, one-of-each micro case, partition totals."""

import random

from osm_hadoop_spark.operators.allen import RELATIONS, allen_census


def _rel(sa, ea, sb, eb):
    if sa == sb and ea == eb:
        return "equals"
    if sa == sb:
        return "starts" if ea < eb else "started_by"
    if ea == eb:
        return "finishes" if sa > sb else "finished_by"
    if ea == sb:
        return "meets"
    if eb == sa:
        return "met_by"
    if ea < sb:
        return "before"
    if eb < sa:
        return "after"
    if sa < sb < ea < eb:
        return "overlaps"
    if sb < sa < eb < ea:
        return "overlapped_by"
    if sa > sb and ea < eb:
        return "during"
    return "contains"


def _census(avs, bvs):
    out = {r: 0 for r in RELATIONS}
    for k, sa, ea in avs:
        for k2, sb, eb in bvs:
            if k == k2:
                out[_rel(sa, ea, sb, eb)] += 1
    return out


def _run(spark, avs, bvs, bucket_width=10):
    a = spark.createDataFrame(avs, "key long, s long, e long")
    b = spark.createDataFrame(bvs, "key long, s long, e long")
    rows = allen_census(a, b, bucket_width=bucket_width).collect()
    assert len(rows) == 13
    return {r.relation: r.n_pairs for r in rows}


def test_one_of_each(spark):
    avs = [(1, 10, 20)]
    bvs = [
        (1, 10, 20),  # equals
        (1, 10, 25),  # starts
        (1, 10, 15),  # started_by
        (1, 5, 20),   # finishes
        (1, 12, 20),  # finished_by
        (1, 20, 30),  # meets
        (1, 5, 10),   # met_by
        (1, 15, 30),  # overlaps
        (1, 5, 12),   # overlapped_by
        (1, 5, 30),   # during
        (1, 12, 18),  # contains
        (1, 25, 30),  # before
        (1, 1, 5),    # after
    ]
    got = _run(spark, avs, bvs)
    assert got == {r: 1 for r in RELATIONS}


def test_matches_brute(spark):
    rng = random.Random(21)
    avs = [
        (k, s, s + rng.randint(1, 30))
        for k in range(4)
        for s in [rng.randint(0, 100) for _ in range(25)]
    ]
    bvs = [
        (k, s, s + rng.randint(1, 30))
        for k in range(4)
        for s in [rng.randint(0, 100) for _ in range(25)]
    ]
    got = _run(spark, avs, bvs)
    assert got == _census(avs, bvs)
    # partition: every ordered same-key pair is classified exactly once
    assert sum(got.values()) == 4 * 25 * 25


def test_degenerate_dropped_and_cross_key_ignored(spark):
    avs = [(1, 5, 5), (1, 0, 10), (2, 0, 10)]
    bvs = [(1, 20, 30), (3, 0, 10)]
    got = _run(spark, avs, bvs)
    assert got["before"] == 1 and sum(got.values()) == 1
