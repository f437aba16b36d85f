"""TWAP exact (operators/timeseries.py): hand-computed step coverage,
forward-fill at entry, uncovered head, duplicate-instant rule."""

from osm_hadoop_spark.operators.timeseries import twap_exact


def _run(spark, rows, w0, w1):
    df = spark.createDataFrame(rows, "key long, ts_us long, v long")
    return {r.key: (r.num, r.den) for r in twap_exact(df, w0, w1).collect()}


def test_step_coverage_and_ffill(spark):
    rows = [
        (1, 0, 10),    # before window; holds [100, 150)
        (1, 150, 20),  # [150, 300)
        (1, 300, 30),  # [300, 500)
    ]
    got = _run(spark, rows, 100, 500)
    num = 10 * 50 + 20 * 150 + 30 * 200
    assert got[1] == (num, 400)


def test_uncovered_head_excluded(spark):
    rows = [(1, 250, 4)]  # first obs inside window
    got = _run(spark, rows, 100, 500)
    assert got[1] == (4 * 250, 250)


def test_after_window_and_absent_keys(spark):
    rows = [(1, 600, 9), (2, 0, 5)]
    got = _run(spark, rows, 100, 500)
    assert 1 not in got           # only obs at/after w1
    assert got[2] == (5 * 400, 400)


def test_duplicate_instant_last_write_wins(spark):
    rows = [(1, 200, 3), (1, 200, 8), (1, 400, 1)]
    got = _run(spark, rows, 100, 500)
    # at t=200 the larger value 8 wins; 3 covers zero time
    assert got[1] == (8 * 200 + 1 * 100, 300)


def test_stale_pre_window_obs_superseded(spark):
    rows = [(1, 0, 7), (1, 50, 2), (1, 300, 6)]
    got = _run(spark, rows, 100, 500)
    # 7 covers nothing (superseded at 50, still pre-window);
    # 2 forward-fills [100, 300); 6 covers [300, 500)
    assert got[1] == (2 * 200 + 6 * 200, 400)
