"""Time-series regularization: fixed-step resample + forward-fill.

The gap-filling counterpart to asof.py's point-in-time join (engine
addition — the reference has no temporal operators): turn an irregular
event stream into a dense per-key series at a fixed step, carrying the
last observed value across empty buckets. This is the standard prep step
for downstream windowed models (a value "in force" at every step).

Plan shape, and why it scales:
  1. one hash aggregate over the raw events picks the last observation per
     (key, bucket) — the ONLY full-data shuffle; everything after operates
     on bucket-level rows (≤ time-span/step per key, data-size-independent);
  2. per-key bucket spans via min/max aggregate;
  3. the dense grid is generated executor-side with sequence() + explode —
     no driver loop, no range table;
  4. grid LEFT JOIN observations on (key, bucket), then one ordered window
     `last(value, ignorenulls)` per key forward-fills.
Skew note: a single key's series lives in one window partition, but its
length is bounded by span/step (choose the step for the retention window),
not by event volume — hot keys collapse at step 1's partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(events: DataFrame, key: str = "user_id", ts: str = "ts",
                   value: str = "value", step_ms: int = 21_600_000,
                   order_tiebreak: str = "event_id") -> DataFrame:
    """Dense (key, bucket) series from min to max observed bucket per key,
    forward-filled. bucket = floor(epoch_ms / step_ms); the observation
    kept per bucket is the one with the greatest (ts, tiebreak) — a
    deterministic "last write wins". Output: key, bucket, value_ffill,
    observed (1 where the bucket had an event)."""
    ms = F.unix_millis(F.col(ts).cast("timestamp"))
    ev = events.select(
        F.col(key), F.floor(ms / step_ms).alias("bucket"),
        F.struct(
            ms.alias("ms"),
            F.col(order_tiebreak).alias("tb"),
            F.col(value).alias("v"),
        ).alias("obs"),
    )
    # lexicographic struct max == last-by-(ts, tiebreak); (ms, tb) is unique
    # so the value never participates in the comparison
    obs = ev.groupBy(key, "bucket").agg(F.max("obs")["v"].alias("v_obs"))
    # obs feeds two branches (grid generation and the fill join). Without a
    # barrier Catalyst re-derives each branch from the RAW events — a
    # groupBy-spans variant gets rewritten into an independent min/max
    # aggregate over the source, and the window variant's branches diverge
    # under column pruning, defeating ReuseExchange — i.e. TWO full scans
    # of the 100 TB side. The lazy localCheckpoint (same idiom as knn.py)
    # materializes the bucket-level rows once; both branches re-read that
    # tiny relation. Caught by tests/test_timeseries.py's plan audit.
    obs = obs.localCheckpoint(eager=False)
    wk = Window.partitionBy(key)
    grid = (
        obs.withColumn("min_b", F.min("bucket").over(wk))
        .withColumn("max_b", F.max("bucket").over(wk))
        .where(F.col("bucket") == F.col("min_b"))
        .select(
            F.col(key),
            F.explode(F.sequence("min_b", "max_b")).alias("bucket"),
        )
    )
    joined = grid.join(obs, [key, "bucket"], "left")
    w = (
        Window.partitionBy(key).orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key), F.col("bucket"),
        F.last("v_obs", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("v_obs").isNotNull().cast("int").alias("observed"),
    )


def resample_interp(events: DataFrame, key: str = "user_id", ts: str = "ts",
                    value: str = "value", step_ms: int = 21_600_000,
                    order_tiebreak: str = "event_id",
                    scale: int = 100) -> DataFrame:
    """Fixed-step resample with LINEAR interpolation between bracketing
    observations — the sibling of resample_ffill for continuous signals
    (sensor fusion, financial marks), exact integers throughout.

    At each dense grid instant T = bucket*step_ms the value is
        y(T) = y1 + (y2 - y1) * (T - t1) / (t2 - t1)
    over the nearest observations t1 <= T < t2 of the key, reported as
    the UNREDUCED integer rational (num, den):
        num = y1*(t2-t1) + (y2-y1)*(T-t1),  den = t2-t1
    (values quantized to integer `scale`-ths first). An observation
    exactly at T makes the formula collapse to y1 — no special case.
    Outside the observed range the nearer endpoint is held
    (mode 'ffill'/'bfill', den = 1); interior instants are 'interp'.

    Plan — the union-sentinel shape, ONE sort per key, NO join: grid
    instants (null value) union the per-ms deduped observations; a
    forward cumulative last-non-null window carries (t1, y1) onto each
    grid row and the mirrored backward window carries (t2, y2). Order
    ties at T break by is_grid so a boundary observation lands on the
    t1 side. Both windows share the same (key) partitioning — at 100 TB
    this is one shuffle + two in-partition passes, and the grid side is
    generated, never scanned.
    """
    ms = F.unix_millis(F.col(ts).cast("timestamp"))
    cents = F.floor(F.col(value) * scale + F.lit(0.5)).cast("bigint")
    obs = (
        events.select(
            F.col(key).alias("k"), ms.alias("ms"),
            F.struct(F.col(order_tiebreak).alias("tb"), cents.alias("v")).alias("o"),
        )
        .groupBy("k", "ms")
        .agg(F.max("o")["v"].alias("y"))
        .localCheckpoint(eager=False)  # two consumers (grid bounds + union)
    )
    grid = (
        obs.select("k", F.floor(F.col("ms") / step_ms).alias("bucket"))
        .groupBy("k")
        .agg(F.min("bucket").alias("min_b"), F.max("bucket").alias("max_b"))
        .select("k", F.explode(F.sequence("min_b", "max_b")).alias("bucket"))
    )
    u = grid.select(
        "k", (F.col("bucket") * step_ms).alias("t"),
        F.lit(1).alias("is_grid"), "bucket",
        F.lit(None).cast("bigint").alias("y"),
    ).unionByName(obs.select(
        "k", F.col("ms").alias("t"),
        F.lit(0).alias("is_grid"),
        F.lit(None).cast("bigint").alias("bucket"), "y",
    ))
    pt = F.when(F.col("y").isNotNull(), F.struct(F.col("t").alias("ot"), F.col("y").alias("oy")))
    wf = (
        Window.partitionBy("k").orderBy("t", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy("k").orderBy(F.desc("t"), F.desc("is_grid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "k", "t", "is_grid", "bucket",
        F.last(pt, ignorenulls=True).over(wf).alias("p1"),
        F.last(pt, ignorenulls=True).over(wb).alias("p2"),
    ).filter("is_grid = 1")
    t1, y1 = F.col("p1.ot"), F.col("p1.oy")
    t2, y2 = F.col("p2.ot"), F.col("p2.oy")
    return carried.select(
        F.col("k").alias(key), "bucket",
        F.when(t1.isNull(), F.lit("bfill"))
        .when(t2.isNull(), F.lit("ffill"))
        .otherwise(F.lit("interp")).alias("mode"),
        F.when(t1.isNull(), y2)
        .when(t2.isNull(), y1)
        .otherwise(y1 * (t2 - t1) + (y2 - y1) * (F.col("t") - t1)).alias("num"),
        F.when(t1.isNull() | t2.isNull(), F.lit(1).cast("bigint"))
        .otherwise(t2 - t1).alias("den"),
    )


def retention_cohorts(events: DataFrame, key: str = "user_id",
                      day: str = "day") -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted on each later activity day.

    Input: DataFrame(key, day) — integer activity days (any granularity;
    callers bucket timestamps first).  Returns DataFrame(cohort_day,
    day_k, n_active, n_cohort): of the ``n_cohort`` users whose first
    day is ``cohort_day``, ``n_active`` were active ``day_k`` days later
    (day_k = 0 row always equals the cohort size).

    Plan: distinct (key, day) -> first-day agg -> ONE equi-join back on
    key -> (cohort, offset) count, + a broadcast of the tiny cohort-size
    relation. Nothing holds per-user state beyond the first-day row.
    """
    active = events.select(F.col(key).alias("k"), F.col(day).alias("d")).distinct()
    firsts = active.groupBy("k").agg(F.min("d").alias("d0"))
    sizes = firsts.groupBy("d0").agg(F.count(F.lit(1)).alias("n_cohort"))
    ret = (
        active.join(firsts, "k")
        .groupBy(F.col("d0").alias("cohort_day"), (F.col("d") - F.col("d0")).alias("day_k"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return ret.join(
        F.broadcast(sizes.withColumnRenamed("d0", "cohort_day")), "cohort_day"
    ).select("cohort_day", "day_k", "n_active", "n_cohort")


def trend_stats(points: DataFrame, key: str = "user_id",
                x: str = "x", y: str = "y") -> DataFrame:
    """Per-key OLS slope as EXACT integer sufficient statistics.

    The distributable regression form: one partial-aggregatable pass
    collects (n, Σx, Σy, Σxy, Σx²) and the slope is the integer rational
        slope = slope_num / slope_den
        slope_num = n*Σxy - Σx*Σy,   slope_den = n*Σx² - (Σx)²
    (den = 0 iff all x equal — emitted as-is, callers decide).  No float
    appears anywhere, so the cross-engine twin is bit-exact; the float
    slope is a deterministic post-division consumers apply at the edge.

    Returns DataFrame(key, n, sum_x, sum_y, slope_num, slope_den).
    """
    xc, yc = F.col(x).cast("long"), F.col(y).cast("long")
    agg = points.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xc).alias("sum_x"),
        F.sum(yc).alias("sum_y"),
        F.sum(xc * yc).alias("sum_xy"),
        F.sum(xc * xc).alias("sum_x2"),
    )
    return agg.select(
        key, "n", "sum_x", "sum_y",
        (F.col("n") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")).alias("slope_num"),
        (F.col("n") * F.col("sum_x2") - F.col("sum_x") * F.col("sum_x")).alias("slope_den"),
    )


def theil_sen(points: DataFrame, key: str = "user_id",
              x: str = "x", y: str = "y") -> DataFrame:
    """Per-key Theil–Sen slope: the MEDIAN pairwise slope — the robust
    twin of trend_stats (OLS breaks down at one outlier; Theil–Sen
    tolerates ~29% contamination).

    Exactness without gcd or floats in the VALUE: the selected slope is
    reported as the integer pair (slope_num, slope_den), den > 0. Pairs
    are ranked by the IEEE double num/den — legitimate as a pure sort
    key because int64/int64 division is bit-identical across engines,
    and for |num| ≤ 2^20, den ≤ 2^20 two distinct rationals differ by
    ≥ 1/(d₁d₂) ≥ 2^-40 while the double carries 52 bits — order can tie
    only at exactly equal values. Value-ties are then ordered by
    (den, num), so every engine selects the same concrete pair. The
    lower median (rank ⌈m/2⌉) is used; pairs with equal x are excluded
    (vertical slope), keys with no valid pair are absent.

    Scale: the pair join is the textbook O(n²)-per-key construction —
    per-key n here is bounded (events per user per retention window);
    for unbounded keys use the repeated-median or sampled variant. The
    join and the ranking window share the same `key` shuffle.

    Returns DataFrame(key, m_pairs, slope_num, slope_den).
    """
    a = points.select(F.col(key), F.col(x).alias("_xa"), F.col(y).alias("_ya"))
    b = points.select(F.col(key), F.col(x).alias("_xb"), F.col(y).alias("_yb"))
    pairs = a.join(b, key).filter(F.col("_xa") < F.col("_xb")).select(
        key,
        (F.col("_yb") - F.col("_ya")).cast("long").alias("num"),
        (F.col("_xb") - F.col("_xa")).cast("long").alias("den"),
    )
    w = Window.partitionBy(key)
    ranked = pairs.select(
        key, "num", "den",
        (F.col("num").cast("double") / F.col("den").cast("double")).alias("_v"),
    ).select(
        key, "num", "den",
        F.row_number().over(w.orderBy("_v", "den", "num")).alias("_rn"),
        F.count(F.lit(1)).over(w).alias("m_pairs"),
    )
    return ranked.filter(
        F.col("_rn") == F.expr("(m_pairs + 1) DIV 2")
    ).select(
        key, F.col("m_pairs").cast("long"),
        F.col("num").alias("slope_num"), F.col("den").alias("slope_den"),
    )


def cusum_changepoint(events: DataFrame, key: str = "user_id",
                      ts: str = "ts", tiebreak: str = "event_id",
                      value: str = "value", scale: int = 100) -> DataFrame:
    """Single-changepoint CUSUM per key, EXACT integer form.

    For the per-key series x_1..x_n ordered by (ts, tiebreak), the
    classic CUSUM deviation at split i is prefix_i - (i/n)*total — the
    gap between the observed prefix and the no-change expectation. We
    keep it integral by scaling through n:

        D_i = n * prefix_i - i * total        (D_n = 0 identically)

    and report argmax |D_i| over 1 <= i < n, ties to the EARLIEST i.
    Values become integers via the shared floor(x*scale + 0.5) cents
    convention, so the twin is bit-exact cross-engine.

    Plan: ONE exchange+sort gives prefix/rank/total in a single Window
    pass (same partition key and order, frames differ); the argmax is a
    lexicographic struct-max hash aggregate on the SAME key, so Catalyst
    reuses the window's partitioning — no second shuffle. Per-key state
    is the key's own row count (retention-bounded), never data-scale.

    Returns DataFrame(key, cp_i, d_abs, n): the 1-based split index,
    the scaled deviation |D_i|, and the series length. Keys with n < 2
    have no interior split and are dropped.
    """
    cents = F.floor(F.col(value) * scale + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    wall = Window.partitionBy(key)
    rows = events.select(
        F.col(key),
        F.row_number().over(w).alias("_i"),
        F.sum(cents).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_pre"),
        F.sum(cents).over(wall).alias("_tot"),
        F.count(F.lit(1)).over(wall).alias("_n"),
    ).filter(F.col("_i") < F.col("_n"))
    d = F.col("_n") * F.col("_pre") - F.col("_i") * F.col("_tot")
    best = rows.select(
        key,
        F.struct(
            F.abs(d).alias("d_abs"),
            (-F.col("_i")).alias("_neg_i"),
            F.col("_n").alias("n"),
        ).alias("_s"),
    ).groupBy(key).agg(F.max("_s").alias("_s"))
    return best.select(
        key,
        (-F.col("_s._neg_i")).alias("cp_i"),
        F.col("_s.d_abs").alias("d_abs"),
        F.col("_s.n").alias("n"),
    )


def acf_stats(events: DataFrame, key: str = "event_type", ts: str = "ts",
              value: str = "value", max_lag: int = 5,
              quantum: int = 100) -> DataFrame:
    """Per-key autocorrelation moment sums at lags 1..max_lag — the inputs
    to the sample ACF (Box-Jenkins model identification, seasonality and
    burst detection over metric streams).

    Values are quantized v = floor(value*quantum) once (the engine's exact-
    integer discipline), so every emitted moment is an exact int64 and the
    consumer forms r_L = (n·Σxy − Σx·Σy) / sqrt((n·Σxx − (Σx)²)(n·Σyy −
    (Σy)²)) in whatever precision it wants. Pair (x_t, x_{t+L}) means
    consecutive BY ORDER within the key's time series (ts, then the id
    column as total-order tiebreak).

    Plan: ONE window sort per key computes all max_lag leads in a single
    pass (WindowExec evaluates the lead frame once per row), the lag axis
    unpivots via an inline array (slim: 2 ints per (row, lag)), and a
    map-side-combinable hash aggregate reduces to key × max_lag rows. One
    shuffle total (the window's), reused by the aggregate only through the
    slim unpivoted projection. A key's series must fit one task — the
    standard windowed-series contract (bound the retention window, or
    pre-bucket time into sessions upstream).
    """
    v = F.floor(F.col(value) * quantum).cast("bigint")
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col("event_id"))
    d = events.select(key, ts, "event_id", v.alias("v"))
    leads = [F.lead("v", L).over(w).alias(f"_l{L}") for L in range(1, max_lag + 1)]
    d = d.select(key, "v", *leads)
    pairs = F.array(
        *[
            F.struct(
                F.lit(L).alias("lag_n"),
                F.col("v").alias("x"),
                F.col(f"_l{L}").alias("y"),
            )
            for L in range(1, max_lag + 1)
        ]
    )
    e = (
        d.select(key, F.explode(pairs).alias("p"))
        .filter(F.col("p.y").isNotNull())
        .select(key, "p.lag_n", "p.x", "p.y")
    )
    return e.groupBy(key, "lag_n").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )


def ewma_final(events: DataFrame, key: str = "user_id", ts: str = "ts",
               value: str = "value", quantum: int = 100) -> DataFrame:
    """Per-key exponentially-weighted moving average with α = 1/4, folded
    in exact fixed-point integers — the keyed-state summary a feature
    store or drift monitor keeps per entity (the batch twin of a stateful
    streaming accumulator).

    Recursion: e_1 = v_1;  e_t = floor((3·e_{t-1} + v_t) / 4)
    with v = floor(value·quantum). The divide-by-4 uses floor on an
    EXACT double (|3e+v| < 2^50), the one rounding rule Spark and DuckDB
    share for negatives — integer `div` truncates toward zero in Spark
    and would diverge below zero.

    Plan: one hash aggregate builds the per-key ordered series
    (array_sort on (ts, id, v) structs — map-side combinable collect),
    then the fold is a single codegen aggregate() over the array. A key's
    history must fit a row — the same bounded-series contract as
    resample_ffill; cap the retention window upstream.
    """
    v = F.floor(F.col(value) * quantum).cast("bigint")
    d = events.select(key, F.struct(ts, "event_id", v.alias("v")).alias("s"))
    g = d.groupBy(key).agg(
        F.array_sort(F.collect_list("s")).alias("_ser")
    )
    fold = F.expr(
        "aggregate(slice(_ser, 2, size(_ser) - 1), _ser[0].v, "
        "(acc, x) -> cast(floor((3 * acc + x.v) / 4) AS bigint))"
    )
    return g.select(
        key,
        F.size("_ser").alias("n_events"),
        fold.alias("ewma_q"),
    )


def robust_outlier_stats(events: DataFrame, key: str = "user_id",
                         value: str = "value",
                         quantum: int = 100) -> DataFrame:
    """Per-key robust location/scale + outlier census: lower median and
    MAD (median absolute deviation) over quantized values, then the count
    of points beyond 3 MADs — the standard contamination-resistant
    screen for metric streams (mean/stddev break down under the very
    outliers being hunted).

    Exactness: the median is DEFINED as the element at 1-based rank
    floor((n+1)/2) under the total order (v, event_id) — a rank-based
    definition both engines implement identically (never an engine
    median() builtin, whose interpolation rules differ). All outputs are
    exact int64.

    Plan: two partitioned window passes (rank + per-key count in one
    window frame each) and two hash aggregates — no global windows, no
    Python. Key cardinality bounds the joins; per-key series length only
    affects the partitioned sorts.
    """
    v = F.floor(F.col(value) * quantum).cast("bigint")
    d = events.select(key, v.alias("v"), "event_id")
    w = Window.partitionBy(key).orderBy("v", "event_id")
    wc = Window.partitionBy(key)
    ranked = d.select(
        key, "v", "event_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    med = ranked.groupBy(key).agg(
        F.max(
            F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("v"))
        ).alias("med_q"),
        F.max("n").alias("n_events"),
    )
    dd = d.join(med, key).select(
        key, "v", "event_id", "med_q", "n_events",
        F.abs(F.col("v") - F.col("med_q")).alias("ad"),
    )
    w2 = Window.partitionBy(key).orderBy("ad", "event_id")
    ranked2 = dd.select(
        key, "ad", "med_q", "n_events",
        F.row_number().over(w2).alias("rn"),
    )
    mad = ranked2.groupBy(key).agg(
        F.max(
            F.when(
                F.col("rn") == F.floor((F.col("n_events") + 1) / 2),
                F.col("ad"),
            )
        ).alias("mad_q"),
        F.max("med_q").alias("med_q"),
        F.max("n_events").alias("n_events"),
    )
    out = dd.select(key, "ad").join(mad, key).groupBy(
        key
    ).agg(
        F.max("med_q").alias("med_q"),
        F.max("mad_q").alias("mad_q"),
        F.max("n_events").alias("n_events"),
        F.sum(
            F.when(F.col("ad") > 3 * F.col("mad_q"), 1).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
    )
    return out.select(key, "n_events", "med_q", "mad_q", "n_outliers")


def weighted_median(rows: DataFrame, key: str, value: str,
                    weight: str) -> DataFrame:
    """Per-key LOWER WEIGHTED MEDIAN: the smallest v whose cumulative
    weight W(v) = sum over x <= v of w(x) satisfies 2*W(v) >= total
    weight — the robust weighted-location estimator (unweighted median
    is the w=1 special case). Exact int64 throughout, no division.

    Plan: pre-aggregate (key, v) -> sum(w) (a partial-aggregatable
    shuffle that collapses duplicate values BEFORE any sort — the
    cumulative weight is per DISTINCT value by definition), then ONE
    partitioned sort serves both window frames (running + total share
    the exchange), filter 2*run >= tot, min-aggregate per key. Per-key
    distinct-value count bounds the sort; nothing is buffered per group
    (contrast exact_quantiles_events, which pins Spark's buffering
    percentile() — this is the scalable exact form).
    """
    g = rows.groupBy(key, F.col(value).alias("v")).agg(
        F.sum(weight).cast("bigint").alias("sw")
    )
    wrun = (
        Window.partitionBy(key)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(key)
    r = g.select(
        key, "v",
        F.sum("sw").over(wrun).alias("run"),
        F.sum("sw").over(wtot).alias("tot"),
    )
    return (
        r.filter(2 * F.col("run") >= F.col("tot"))
        .groupBy(key)
        .agg(
            F.min("v").alias("wmedian"),
            F.max("tot").alias("total_w"),
        )
    )


def rolling_active_users(events: DataFrame, key: str = "user_id",
                         day: str = "day", window_days: int = 7) -> DataFrame:
    """Per observed day: exact DAU and trailing-window WAU (distinct
    users over [day - window_days + 1, day]) — the DAU/WAU/MAU
    engagement family. Output rows are restricted to days that carry at
    least one event themselves (the conventional calendar of an
    activity report).

    Plan: dedup to (user, day) first (the partial-aggregatable shrink —
    raw event volume never reaches the window logic), then each distinct
    (user, day) contributes to window_days target days via a bounded
    sequence explode, and ONE count-distinct aggregate per target day
    finishes. Amplification is exactly window_days x the DISTINCT
    (user, day) count — linear, shuffle keyed on the target day. For
    month-scale windows at 100 TB the alternative is the sorted
    per-user segment-merge (islands machinery); the explode form wins
    while window_days stays small.
    """
    ud = events.select(F.col(key).alias("u"), F.col(day).alias("d")).distinct()
    days = ud.select("d").distinct()
    contrib = ud.select(
        "u",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + F.lit(window_days - 1))
        ).alias("td"),
    ).join(days.select(F.col("d").alias("td")), "td", "semi")
    wau = contrib.groupBy(F.col("td").alias("d")).agg(
        F.count_distinct("u").cast("bigint").alias("wau")
    )
    dau = ud.groupBy("d").agg(
        F.count_distinct("u").cast("bigint").alias("dau")
    )
    return dau.join(wau, "d").select(
        F.col("d").alias("day"), "dau", "wau"
    )


def seasonal_anomaly(series: DataFrame, period: int, key: str = "key",
                     t: str = "t", v: str = "v") -> DataFrame:
    """Per-(key, phase) seasonal profile + most-anomalous bin, exact.

    The seasonal member of the trend family (trend_stats/theil_sen fit
    a LINE; cusum finds a LEVEL SHIFT; this profiles a PERIOD): bins
    t are folded by phase = t mod period (e.g. day-of-week for period
    7) and each phase's mean is the seasonal component. Exactness by
    clearing the mean's denominator (the spatialstats.py discipline):
    with n bins in a phase and S their sum, the scaled residual of bin
    (t, v) is

        num = v * n - S         (= n * (v - mean), int64, no float)

    and the phase's most-above-seasonal bin is argmax (num, t) — the
    tie-break on t makes the pick total, pinned in tests. Comparisons
    are only ever WITHIN a phase (num carries the phase's own scale n),
    which is the statistically meaningful contrast anyway.

    Returns (key, phase, n_bins, sum_v, anom_t, anom_v, anom_num).

    Plan: ONE hash partition by (key, phase) evaluates all four window
    aggregates and the argmax filter — no join, no second shuffle; the
    input is the (key, bin) pre-aggregate, so volume is bounded by
    keys x retention bins, not event count.
    """
    if period < 1:
        raise ValueError("period must be >= 1")
    s = series.select(
        F.col(key).alias("key"),
        (F.col(t).cast("bigint") % period).alias("phase"),
        F.col(t).cast("bigint").alias("t"),
        F.col(v).cast("bigint").alias("v"),
    )
    w = Window.partitionBy("key", "phase")
    r = s.select(
        "key", "phase", "t", "v",
        F.count(F.lit(1)).over(w).alias("n_bins"),
        F.sum("v").over(w).alias("sum_v"),
    ).withColumn(
        "num", F.col("v") * F.col("n_bins") - F.col("sum_v")
    )
    r = r.withColumn("mx", F.max(F.struct("num", "t")).over(w))
    return r.filter(
        (F.col("num") == F.col("mx.num")) & (F.col("t") == F.col("mx.t"))
    ).select(
        "key", "phase",
        F.col("n_bins").cast("long").alias("n_bins"),
        F.col("sum_v").cast("long").alias("sum_v"),
        F.col("t").alias("anom_t"),
        F.col("v").alias("anom_v"),
        F.col("num").cast("long").alias("anom_num"),
    )


def kendall_tau_census(
    points: DataFrame,
    key: str = "key",
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Per-key Kendall rank-correlation census — the BIVARIATE member
    of the robust family (theil_sen fits a slope, mann_kendall tests a
    time trend; this measures x-vs-y association with no distributional
    assumption and no float).  Over each key's unordered point pairs
    (paired once via id order):

        nc   concordant  (x and y move the same way)
        nd   discordant  (opposite ways)
        tx   tied in x only      ty   tied in y only
        txy  tied in both

    with nc + nd + tx + ty + txy = C(n, 2) (pinned in tests); tau-b =
    (nc - nd) / sqrt((n0 - Tx)(n0 - Ty)) is presentation-time.

    Plan: one pair equi-self-join on the key (theil_sen posture —
    per-key n bounded by the retention window) + one
    partial-aggregatable conditional-sum aggregate.
    Returns (key, n, nc, nd, tx, ty, txy).
    """
    p = points.select(
        F.col(key).alias("key"),
        F.col(id_col).cast("bigint").alias("i"),
        F.col(x).cast("bigint").alias("px"),
        F.col(y).cast("bigint").alias("py"),
    )
    a, b = p.alias("a"), p.alias("b")
    dx = F.col("b.px") - F.col("a.px")
    dy = F.col("b.py") - F.col("a.py")
    pairs = a.join(
        b,
        (F.col("a.key") == F.col("b.key")) & (F.col("a.i") < F.col("b.i")),
    )
    cnt = p.groupBy("key").agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = pairs.groupBy(F.col("a.key").alias("key")).agg(
        F.sum(F.when((dx != 0) & (dy != 0) & (dx * dy > 0), 1).otherwise(0))
        .cast("long").alias("nc"),
        F.sum(F.when((dx != 0) & (dy != 0) & (dx * dy < 0), 1).otherwise(0))
        .cast("long").alias("nd"),
        F.sum(F.when((dx == 0) & (dy != 0), 1).otherwise(0))
        .cast("long").alias("tx"),
        F.sum(F.when((dx != 0) & (dy == 0), 1).otherwise(0))
        .cast("long").alias("ty"),
        F.sum(F.when((dx == 0) & (dy == 0), 1).otherwise(0))
        .cast("long").alias("txy"),
    )
    z = F.lit(0).cast("long")
    return cnt.join(agg, "key", "left").select(
        "key", "n",
        F.coalesce("nc", z).alias("nc"),
        F.coalesce("nd", z).alias("nd"),
        F.coalesce("tx", z).alias("tx"),
        F.coalesce("ty", z).alias("ty"),
        F.coalesce("txy", z).alias("txy"),
    )


# the six valid (a<=b, b<=c, a<=c) bit codes under the Bandt-Pompe
# position tie-break; TTF and FFT violate transitivity
ORDINAL_PATTERNS = (0, 2, 3, 4, 5, 7)


def ordinal_pattern_census(
    series: DataFrame,
    key: str = "key",
    t: str = "t",
    v: str = "v",
) -> DataFrame:
    """Per-key census of order-3 ordinal patterns (Bandt-Pompe 2002) —
    the permutation-entropy ingredient and the cheapest symbolic-
    dynamics fingerprint (a monotone series concentrates on one
    pattern; noise spreads over all six; regime changes move the
    histogram).  Each consecutive triple (v_t, v_t1, v_t2) in t order
    is coded by the bits (a<=b, b<=c, a<=c) — `<=` implements the
    standard earlier-position-wins tie-break, and transitivity leaves
    exactly the six codes in ORDINAL_PATTERNS.  Counts are exact;
    callers form the entropy from the histogram at presentation time.

    Returns (key, pattern, n) zero-filled over all six patterns for
    every key with >= 3 points.  Plan: ONE window sort per key (two
    leads), one partial-aggregatable groupBy, a 6-row literal frame
    for the zero-fill.
    """
    w = Window.partitionBy("key").orderBy("t")
    s = series.select(
        F.col(key).alias("key"),
        F.col(t).cast("bigint").alias("t"),
        F.col(v).cast("bigint").alias("v"),
    )
    r = s.select(
        "key",
        F.col("v").alias("a"),
        F.lead("v", 1).over(w).alias("b"),
        F.lead("v", 2).over(w).alias("c"),
    ).filter(F.col("c").isNotNull())
    code = (
        (F.col("a") <= F.col("b")).cast("bigint") * 4
        + (F.col("b") <= F.col("c")).cast("bigint") * 2
        + (F.col("a") <= F.col("c")).cast("bigint")
    )
    obs = r.select("key", code.alias("pattern")).groupBy(
        "key", "pattern"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    pats = obs.sparkSession.createDataFrame(
        [(p,) for p in ORDINAL_PATTERNS], "pattern long"
    )
    keys = obs.select("key").distinct()
    return (
        keys.crossJoin(F.broadcast(pats))
        .join(obs, ["key", "pattern"], "left")
        .select(
            "key", "pattern",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    )


def twap_exact(
    events: DataFrame,
    w0: int,
    w1: int,
    key: str = "key",
    ts: str = "ts_us",
    v: str = "v",
) -> DataFrame:
    """Exact time-weighted average ingredients over window [w0, w1) —
    the metrics/finance aggregate (TWAP, time-in-state, SLA uptime)
    where a PLAIN mean is wrong because observations are irregular:
    each observation's value holds until the next one (step function),
    and the window mean weights by holding time.

    Per key: observations sorted by ts; observation i covers
    [max(ts_i, w0), min(ts_{i+1}, w1)) — the last one holds to w1, and
    the latest observation AT OR BEFORE w0 carries its value into the
    window head (forward fill).  Keys with no observation before w1
    are absent; uncovered head time (first observation after w0) is
    excluded from the denominator — the honest convention, pinned.

        num = Σ v_i * cover_us_i        den = Σ cover_us_i

    twap = num / den at presentation time; both int64-exact.

    Plan: ONE window sort per key (a lead for the next timestamp),
    clip-to-window arithmetic, one partial-aggregatable groupBy.
    Returns (key, num, den).

    Same-timestamp duplicates: sorted by (ts, v), so all but the
    largest-v row at an instant get zero cover and drop — the
    deterministic "last write wins, ties by value" rule (pinned).
    """
    if not w0 < w1:
        raise ValueError("need w0 < w1")
    w = Window.partitionBy("key").orderBy("ts", "v")
    s = events.select(
        F.col(key).alias("key"),
        F.col(ts).cast("bigint").alias("ts"),
        F.col(v).cast("bigint").alias("v"),
    ).filter(F.col("ts") < w1)
    r = s.withColumn("nxt", F.coalesce(F.lead("ts").over(w), F.lit(w1)))
    start = F.greatest(F.col("ts"), F.lit(w0))
    end = F.least(F.col("nxt"), F.lit(w1))
    cover = F.greatest(end - start, F.lit(0))
    return (
        r.withColumn("cover", cover)
        .filter(F.col("cover") > 0)
        .groupBy("key")
        .agg(
            F.sum(F.col("v") * F.col("cover")).cast("long").alias("num"),
            F.sum("cover").cast("long").alias("den"),
        )
    )


def spearman_census(
    series: DataFrame,
    key: str = "key",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Exact Spearman rank-correlation ingredients per key, tie-aware.

    Spearman's rho is Pearson over AVERAGE ranks; with ties the average
    rank is a half-integer, so the census carries DOUBLED ranks, which
    are exact int64: a tie group whose first position (1-based) is k
    and size is c has doubled average rank 2k + c - 1.  Emitted per
    key: n and the five doubled-rank power sums

        sx = Σ rx2, sy = Σ ry2, sxy = Σ rx2*ry2,
        sx2 = Σ rx2², sy2 = Σ ry2²

    so rho = (n*sxy - sx*sy) / sqrt((n*sx2 - sx²)(n*sy2 - sy²)) is a
    presentation-time scalar and the engine output hash-matches
    bit-for-bit.  (The no-ties shortcut 1 - 6Σd²/... is NOT used — the
    power-sum form is the tie-correct one.)  Overflow: rx2 <= 2n, so
    sxy <= 4n³ < 2^63 to ~1.3M rows per key; shard beyond.

    Plan: two ranked windows over the same (key) partition (one sort
    each by x and y — Catalyst plans two exchanges-free window passes
    over one hash partition when the partition keys agree), then one
    hash aggregate.  The kendall_tau_census pair join is avoided
    entirely — Spearman is the O(n log n) member of the rank family.
    """
    wx = Window.partitionBy(key).orderBy(x)
    wy = Window.partitionBy(key).orderBy(y)
    cx = Window.partitionBy(key, x)
    cy = Window.partitionBy(key, y)
    ranked = series.select(
        F.col(key).alias("key"),
        (2 * F.rank().over(wx) + F.count(F.lit(1)).over(cx) - 1)
        .cast("long").alias("rx2"),
        (2 * F.rank().over(wy) + F.count(F.lit(1)).over(cy) - 1)
        .cast("long").alias("ry2"),
    )
    return ranked.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx2").cast("long").alias("sx"),
        F.sum("ry2").cast("long").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("long").alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("long").alias("sx2"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("long").alias("sy2"),
    )


def pettitt_change(
    series: DataFrame,
    key: str = "key",
    t: str = "t",
    x: str = "x",
) -> DataFrame:
    """Exact Pettitt change-point census per key — the rank-based
    single-changepoint test next to cusum (mean-shift on values) and
    mann_kendall (monotone trend): where does the distribution BREAK?

    Pettitt's U_t = Σ_{i<=t} Σ_{j>t} sgn(x_j - x_i) has the closed
    rank form U_t = 2 Σ_{i<=t} R_i - t (n + 1) with R the tie-averaged
    ranks of the WHOLE series; carrying doubled ranks (2R is integer
    even under ties, the spearman_census discipline) gives

        U_t = cum2_t - t (n + 1),   cum2_t = Σ_{i<=t} 2 R_i

    — all int64, no float, no pair join (the O(n²) definition is the
    pytest twin).  Emitted per key: n, the argmax split position
    t_star (1-based prefix length, smallest on ties), its timestamp
    t_at, and k_stat = max_{1<=t<n} |U_t|.  The significance transform
    2 exp(-6K²/(n³+n²)) is presentation-time.

    Plan: one rank window (by value), one row_number + cumulative
    window (by time), one argmin-struct aggregate — three window
    passes over ONE hash partition per key, no joins.  Overflow:
    cum2 <= 2n², |U| <= n² < 2^63 to ~3e9 rows per key.
    """
    wv = Window.partitionBy(key).orderBy(x)
    cv = Window.partitionBy(key, x)
    wt = Window.partitionBy("key").orderBy("tt")
    wn = Window.partitionBy("key")
    ranked = series.select(
        F.col(key).alias("key"),
        F.col(t).alias("tt"),
        (2 * F.rank().over(wv) + F.count(F.lit(1)).over(cv) - 1)
        .cast("long").alias("r2"),
    )
    cum = ranked.select(
        "key", "tt",
        F.row_number().over(wt).alias("pos"),
        F.sum("r2").over(
            wt.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum2"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    u = cum.filter(F.col("pos") < F.col("n")).select(
        "key", "n",
        F.struct(
            (-F.abs(F.col("cum2") - F.col("pos") * (F.col("n") + 1)))
            .alias("neg_abs_u"),
            F.col("pos").alias("pos"),
            F.col("tt").alias("tt"),
        ).alias("s"),
    )
    best = u.groupBy("key").agg(
        F.max("n").cast("long").alias("n"),
        F.min("s").alias("s"),
    )
    return best.select(
        "key", "n",
        F.col("s.pos").cast("long").alias("t_star"),
        F.col("s.tt").alias("t_at"),
        (-F.col("s.neg_abs_u")).cast("long").alias("k_stat"),
    )
