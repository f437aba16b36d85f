"""ACF moment sums (timeseries.acf_stats): hand-computed lags on a tiny
series; single window pass for all lags."""

import datetime


def _events(spark, vals):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(hours=i), 1, "a", float(v), "{}")
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def test_acf_hand_computed(spark):
    from osm_hadoop_spark.operators.timeseries import acf_stats

    # quantized values (x100): 100, 200, 300, 400
    df = _events(spark, [1.0, 2.0, 3.0, 4.0])
    got = {r["lag_n"]: r for r in acf_stats(df, max_lag=3).collect()}
    r1 = got[1]  # pairs (100,200),(200,300),(300,400)
    assert (r1["n_pairs"], r1["sx"], r1["sy"]) == (3, 600, 900)
    assert r1["sxy"] == 100 * 200 + 200 * 300 + 300 * 400
    assert r1["sxx"] == 100**2 + 200**2 + 300**2
    r3 = got[3]  # one pair (100,400)
    assert (r3["n_pairs"], r3["sxy"]) == (1, 40000)


def test_acf_single_window_pass(spark):
    from osm_hadoop_spark.operators.timeseries import acf_stats

    df = _events(spark, [1.0, 2.0, 3.0])
    plan = (
        acf_stats(df, max_lag=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # all four leads from one Window operator, one unpivot explode
    assert plan.count("Window") == 1
    assert plan.count("Generate") == 1


def test_ewma_hand_computed(spark):
    from osm_hadoop_spark.operators.timeseries import ewma_final

    # v(x100): 400, 800, 100 -> e1=400, e2=floor((1200+800)/4)=500,
    # e3=floor((1500+100)/4)=400
    df = _events(spark, [4.0, 8.0, 1.0])
    r = ewma_final(df, key="user_id").collect()[0]
    assert (r["n_events"], r["ewma_q"]) == (3, 400)


def test_ewma_negative_floor_semantics(spark):
    from osm_hadoop_spark.operators.timeseries import ewma_final

    # negatives must FLOOR (toward -inf), not truncate toward zero:
    # v = -100, -300 -> e2 = floor((-300 + -300)/4) = floor(-150) = -150
    # then a case with a non-integer quotient:
    # v = -100, 1 -> e2 = floor((-300 + 1)/4) = floor(-74.75) = -75
    df = _events(spark, [-1.0, 0.01])
    r = ewma_final(df, key="user_id").collect()[0]
    assert r["ewma_q"] == -75


def test_robust_outliers_hand_computed(spark):
    from osm_hadoop_spark.operators.timeseries import robust_outlier_stats

    # v(x100): 100,200,300,400,10000 -> lower median (n=5, rank 3) = 300
    # ad: 200,100,0,100,9700 -> sorted 0,100,100,200,9700, rank 3 -> 100
    # outliers: ad > 300 -> only 9700
    df = _events(spark, [1.0, 2.0, 3.0, 4.0, 100.0])
    r = robust_outlier_stats(df, key="user_id").collect()[0]
    assert (r["n_events"], r["med_q"], r["mad_q"], r["n_outliers"]) == (
        5, 300, 100, 1,
    )


def test_robust_outliers_even_n_lower_median(spark):
    from osm_hadoop_spark.operators.timeseries import robust_outlier_stats

    # n=4: rank floor(5/2)=2 -> LOWER median: sorted 100,200,300,400 -> 200
    df = _events(spark, [1.0, 2.0, 3.0, 4.0])
    r = robust_outlier_stats(df, key="user_id").collect()[0]
    assert r["med_q"] == 200
