"""Poisson bootstrap (operators/bootstrap.py) vs brute hash weights."""

from __future__ import annotations

import hashlib
from collections import defaultdict


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _w(h: int) -> int:
    return sum(1 for j in range(4) if (h & (3 << (2 * j))) == 0)


def _brute(rows, b):
    out = defaultdict(lambda: [0, 0])
    for rid, v in rows:
        for r in range(b):
            w = _w(_h60(f"bs{r}_{rid}"))
            out[r][0] += w
            out[r][1] += w * v
    return {r: tuple(x) for r, x in out.items()}


def test_bootstrap_matches_brute(spark):
    from osm_hadoop_spark.operators.bootstrap import poisson_bootstrap

    rows = [(i, (i * 37) % 100 - 50) for i in range(400)]
    df = spark.createDataFrame(rows, "event_id long, cents long")
    got = {r.replica: (r.n_eff, r.sum_v)
           for r in poisson_bootstrap(df, "event_id", "cents", 8).collect()}
    assert got == _brute([(str(i), v) for i, v in rows], 8)


def test_bootstrap_weights_center_on_n(spark):
    from osm_hadoop_spark.operators.bootstrap import poisson_bootstrap

    n = 2000
    df = spark.createDataFrame([(i, 1) for i in range(n)],
                               "event_id long, cents long")
    reps = poisson_bootstrap(df, "event_id", "cents", 16).collect()
    assert len(reps) == 16
    effs = [r.n_eff for r in reps]
    # binomial(4, 1/4) per row: replica totals concentrate around n
    # (sd ~ sqrt(3n/4) ~ 39); 5 sd is deterministic-safe
    assert all(abs(e - n) < 200 for e in effs)
    assert min(effs) != max(effs)       # replicas actually differ
    # with v == 1 everywhere, sum_v must equal n_eff exactly
    assert all(r.sum_v == r.n_eff for r in reps)
