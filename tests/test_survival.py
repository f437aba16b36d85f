"""KM lifetable (operators/survival.py): brute replay, at-risk
convention at exit instants, censoring split."""

import random

from osm_hadoop_spark.operators.survival import km_lifetable


def _ref(subs):
    out = {}
    times = sorted({e for _, e, _ in subs})
    for t in times:
        n_risk = sum(1 for s, e, _ in subs if s <= t <= e)
        d = sum(1 for _, e, o in subs if e == t and o)
        c = sum(1 for _, e, o in subs if e == t and not o)
        out[t] = (n_risk, d, c)
    return out


def test_matches_brute(spark):
    rng = random.Random(61)
    data = {}
    rows = []
    for k in range(4):
        subs = []
        for i in range(rng.randint(2, 40)):
            s = rng.randint(0, 50)
            subs.append((s, s + rng.randint(0, 30), rng.random() < 0.6))
        data[k] = subs
        rows += [(k, i, s, e, o) for i, (s, e, o) in enumerate(subs)]
    df = spark.createDataFrame(
        rows, "key long, sid long, start long, end long, observed boolean"
    )
    got = {}
    for r in km_lifetable(df).collect():
        got.setdefault(r.key, {})[r.t] = (r.n_risk, r.d, r.c)
    for k, subs in data.items():
        assert got[k] == _ref(subs)


def test_at_risk_includes_exits_at_t(spark):
    rows = [
        (1, 0, 0, 10, True),
        (1, 1, 0, 10, True),
        (1, 2, 0, 20, False),
        (1, 3, 15, 20, True),
    ]
    df = spark.createDataFrame(
        rows, "key long, sid long, start long, end long, observed boolean"
    )
    got = {r.t: (r.n_risk, r.d, r.c) for r in km_lifetable(df).collect()}
    assert got[10] == (3, 2, 0)   # the two deaths at 10 still at risk
    assert got[20] == (2, 1, 1)   # censored + death at 20
