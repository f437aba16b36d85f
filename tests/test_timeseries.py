"""resample_ffill (operators/timeseries.py): fixed-step resample +
forward-fill semantics on constructed streams."""

from datetime import datetime

from pyspark.sql import functions as F

from osm_hadoop_spark.operators.timeseries import resample_ffill


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.utcfromtimestamp(t), u, float(v)) for i, (t, u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, value double",
    )


def test_gap_fill_and_spans(spark):
    step = 3600_000  # 1 h buckets
    ev = _events(spark, [
        (0, 1, 10.0),        # u1 bucket 0
        (3 * 3600, 1, 20.0),  # u1 bucket 3 (buckets 1-2 are gaps)
        (7200, 2, 5.0),       # u2 single bucket
    ])
    out = {
        (r["user_id"], r["bucket"]): (r["value_ffill"], r["observed"])
        for r in resample_ffill(ev, step_ms=step).collect()
    }
    assert out == {
        (1, 0): (10.0, 1), (1, 1): (10.0, 0), (1, 2): (10.0, 0),
        (1, 3): (20.0, 1), (2, 2): (5.0, 1),
    }


def test_last_write_wins_within_bucket(spark):
    """Two events in one bucket: the greater (ts, event_id) value is kept;
    an exact-tie on ts falls to event_id."""
    step = 3600_000
    ev = _events(spark, [
        (100, 1, 1.0),   # event_id 0
        (200, 1, 2.0),   # event_id 1 -> later ts wins
        (200, 1, 3.0),   # event_id 2 -> same ts, higher id wins
    ])
    out = resample_ffill(ev, step_ms=step).collect()
    assert len(out) == 1
    assert (out[0]["value_ffill"], out[0]["observed"]) == (3.0, 1)


def test_no_leading_nulls_and_dense_grid(spark):
    """Grid starts at each key's first observed bucket, so value_ffill is
    never null, and buckets are contiguous per key."""
    step = 60_000
    ev = _events(spark, [(60 * i * 7, 1, float(i)) for i in range(10)])
    rows = sorted(
        (r["bucket"], r["value_ffill"]) for r in
        resample_ffill(ev, step_ms=step).collect()
    )
    buckets = [b for b, _ in rows]
    assert buckets == list(range(buckets[0], buckets[-1] + 1))
    assert all(v is not None for _, v in rows)


def test_raw_events_scanned_once(spark, tmp_path):
    """Plan audit: the raw event relation is scanned exactly once (the
    (key, bucket) aggregate feeding the obs checkpoint); the grid branch
    reads the materialized bucket-level relation, not the source again."""
    path = str(tmp_path / "ev.parquet")
    _events(spark, [(60 * i, 1 + i % 3, float(i)) for i in range(100)]).write.parquet(path)
    df = resample_ffill(spark.read.parquet(path))
    df.count()  # materialize the lazy checkpoint + AQE final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the main job never touches the source again: both branches read the
    # checkpointed bucket-level relation (the single parquet scan ran
    # inside the checkpoint job)
    assert plan.count("Scan parquet") == 0
    assert plan.count("Scan ExistingRDD") == 2


# --- Theil-Sen robust slope --------------------------------------------------


def _brute_theil_sen(pts):
    """Fraction-exact median pairwise slope, lower median selected by
    (value, den, num) — an independent re-derivation of the rule."""
    from collections import defaultdict
    from fractions import Fraction

    by_key = defaultdict(list)
    for k, x, y in pts:
        by_key[k].append((x, y))
    out = {}
    for k, ps in by_key.items():
        slopes = []
        for i, (xa, ya) in enumerate(ps):
            for xb, yb in ps[i + 1:]:
                if xa == xb:
                    continue
                num, den = yb - ya, xb - xa
                if den < 0:
                    num, den = -num, -den
                slopes.append((Fraction(num, den), den, num))
        if not slopes:
            continue
        slopes.sort()
        _, den, num = slopes[(len(slopes) + 1) // 2 - 1]
        out[k] = (len(slopes), num, den)
    return out


def test_theil_sen_matches_fraction_brute(spark):
    import hashlib

    from osm_hadoop_spark.operators.timeseries import theil_sen

    def h(s, m):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m

    pts = [
        (u, h(f"tsx{u}_{i}", 40), h(f"tsy{u}_{i}", 1000))
        for u in range(25)
        for i in range(h(f"tsn{u}", 30))
    ]
    # crafted: a clean line y = 3x + 7 with ONE wild outlier — Theil-Sen
    # must still report slope exactly 3 (OLS would not)
    pts += [(99, x, 3 * x + 7) for x in range(12)] + [(99, 12, 100000)]
    # all-equal-x key: no valid pair, absent from output
    pts += [(98, 5, v) for v in (1, 2, 3)]
    df = spark.createDataFrame(pts, "user_id long, x long, y long")
    got = {
        r["user_id"]: (r["m_pairs"], r["slope_num"], r["slope_den"])
        for r in theil_sen(df).collect()
    }
    want = _brute_theil_sen(pts)
    assert got == want
    assert 98 not in got
    m, num, den = got[99]
    assert num == 3 * den and den > 0
    assert len(got) > 10


def test_resample_interp_exact_rationals(spark):
    from osm_hadoop_spark.operators.timeseries import resample_interp

    step = 3600_000  # 1 h grid
    # user 1: obs at 0.5h=10.00 and 2.5h=30.00 -> grid hours 0,1,2
    #   h0 (T=0):    before first obs -> bfill 1000
    #   h1 (T=1h):   interp between (0.5h,1000) and (2.5h,3000):
    #                num = 1000*2h + 2000*(0.5h), den = 2h (ms units)
    #   h2 (T=2h):   interp, num = 1000*2h + 2000*1.5h
    ev = _events(spark, [
        (1800, 1, 10.0), (9000, 1, 30.0),
        # user 2: single obs exactly on a boundary -> ffill
        (7200, 2, 5.0),
    ])
    got = {
        (r.user_id, r.bucket): (r.mode, r.num, r.den)
        for r in resample_interp(ev, step_ms=step).collect()
    }
    h = 3600_000
    assert got[(1, 0)] == ("bfill", 1000, 1)
    assert got[(1, 1)] == ("interp", 1000 * 2 * h + 2000 * (h // 2), 2 * h)
    assert got[(1, 2)] == ("interp", 1000 * 2 * h + 2000 * (3 * h // 2), 2 * h)
    # exact values: 10.00 + 20.00 * (0.5/2) = 15.00 ; 10 + 20*(1.5/2) = 25
    assert got[(1, 1)][1] / got[(1, 1)][2] == 1500
    assert got[(1, 2)][1] / got[(1, 2)][2] == 2500
    assert got[(2, 2)] == ("ffill", 500, 1)
    assert len(got) == 4
