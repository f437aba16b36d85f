"""ANALYZE-style exact column profiling in one table scan.

Engine utility: the statistics a cost-based optimizer (or a data-quality
gate on an ingest pipeline) wants per column — row count, null count,
exact NDV, min, max — computed for MANY columns in a single pass over
the table, plus an exact equi-width histogram with caller-fixed bounds
(fixed bounds keep it one-pass; a data-dependent range would need a
second scan or a sketch).

The reference has nothing like this (its "schema" is positional
Writables); it belongs to the engine brief: at ingest you profile the
corpus before committing partition and clustering choices.

Plan shape: `count(distinct c)` for N columns in one aggregate makes
Catalyst plan a single scan + Expand(xN) + two-level hash aggregate —
the standard multi-distinct strategy; the scan happens ONCE and the
Expand rows are slim (one column each + grouping id). The narrow
(column, stat...) output is produced by `stack` over the single
aggregate row, so the whole profile is one job, one shuffle.

100 TB posture: exact NDV on a high-cardinality column is an
irreducible distinct-shuffle of that column's values — that is the
price of EXACT; at planet scale you run this per-partition/incremental
or switch to the HLL sketch family (`operators/sketch.py::
hll_registers`, same output contract, bounded memory). The Expand is
linear fan-out by profiled-column count, so profile the columns you
need, not `*`. min/max/count are partial-aggregatable and free by
comparison.

Cross-engine exactness: all profiled stats are integers or ASCII
strings; numeric min/max are surfaced as canonical strings via
BIGINT casts so one narrow value column serves every column type
without float/decimal formatting drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """DataFrame(col_name, n_rows, n_null, ndv, min_val, max_val) — one row
    per profiled column, computed in ONE scan. String-typed columns
    compare by binary codepoint order (Spark and ANSI SQL default);
    numeric columns must be integral (cast upstream) so the string
    rendering is canonical."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_ndv_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _ndv_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return one.selectExpr(
        "_n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_notnull, ndv, min_val, max_val)",
    ).select(
        "col_name",
        F.col("_n").alias("n_rows"),
        (F.col("_n") - F.col("n_notnull")).alias("n_null"),
        "ndv",
        "min_val",
        "max_val",
    )


def equi_width_histogram(
    df: DataFrame, col: str, lo: int, hi: int, buckets: int
) -> DataFrame:
    """DataFrame(bucket, n) — exact equi-width histogram of an integral
    column over caller-fixed [lo, hi); values outside clamp to the edge
    buckets (bucket 0 / buckets-1) so the counts total n_rows. Fixed
    bounds keep this a single map-side-combinable aggregate."""
    span = hi - lo
    b = F.floor((F.col(col) - F.lit(lo)) * buckets / F.lit(span))
    b = F.greatest(F.lit(0), F.least(F.lit(buckets - 1), b)).cast("bigint")
    return (
        df.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def expectation_census(
    df: DataFrame,
    range_checks: dict[str, tuple],
    domain_checks: dict[str, list],
    unique_cols: list[str],
    ref_checks: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Great-Expectations-style data-quality gate in (almost) one scan:
    DataFrame(check, n_violations) for
      - range:<col>   value outside caller's [lo, hi] (nulls count as
        violations — an out-of-contract cell either way),
      - domain:<col>  value not in the enumerated set,
      - unique:<col>  duplicate occurrences (n_rows - n_distinct),
      - ref:<col>     values missing from a reference key column
        (left-anti count against `ref_checks[col]`, a DataFrame with
        exactly that column).

    The ingest gate a lakehouse runs before committing a snapshot: emit
    the census, alert when any count > 0, quarantine offending
    partitions. Range/domain/unique checks fold into ONE aggregate over
    ONE scan (conditional sums + count_distinct); each referential check
    adds one join against its (usually broadcastable) reference keys.

    100 TB posture: conditional counts are map-side combinable; unique
    via count_distinct costs a distinct shuffle per column (same honest
    caveat as profile_columns — the HLL sketch family is the approximate
    sibling); referential anti-joins broadcast when the dim is small.
    """
    aggs = []
    names = []
    for c, (lo, hi) in range_checks.items():
        bad = ~F.col(c).between(F.lit(lo), F.lit(hi))
        aggs.append(
            F.sum(F.coalesce(bad.cast("bigint"), F.lit(1))).alias(f"_r_{c}")
        )
        names.append((f"range:{c}", f"_r_{c}"))
    for c, dom in domain_checks.items():
        bad = ~F.col(c).isin(dom)
        aggs.append(
            F.sum(F.coalesce(bad.cast("bigint"), F.lit(1))).alias(f"_d_{c}")
        )
        names.append((f"domain:{c}", f"_d_{c}"))
    for c in unique_cols:
        aggs.append(
            (F.count(c) - F.count_distinct(F.col(c))).alias(f"_u_{c}")
        )
        names.append((f"unique:{c}", f"_u_{c}"))
    one = df.agg(*aggs)
    stacked = one.selectExpr(
        f"stack({len(names)}, "
        + ", ".join(f"'{label}', {col}" for label, col in names)
        + ") AS (check, n_violations)"
    )
    out = stacked
    for c, ref in (ref_checks or {}).items():
        miss = (
            df.select(F.col(c)).join(F.broadcast(ref), c, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.lit(f"ref:{c}").alias("check"), "n_violations")
        )
        out = out.unionByName(miss)
    return out.select(
        "check", F.col("n_violations").cast("bigint").alias("n_violations")
    )


def equi_depth_bins(rows: DataFrame, key: str, value: str,
                    k: int) -> DataFrame:
    """Per-key exact equi-depth bin boundaries: boundary i (1-based,
    i = 1..k) is the element at rank ceil(i*n/k) of the sorted multiset
    — the lower exact-rank quantile, so boundary k is the max and every
    bin holds floor/ceil(n/k) elements. The feature-binning primitive
    (WOE buckets, monotonic binning) in its scalable exact form.

    Plan: ONE partitioned sort gives row_number + per-key count in the
    same exchange; each ranked row then emits its 0..1+ owned bin ids by
    pure integer arithmetic — rank rn owns bins floor(k*(rn-1)/n)+1
    through floor(k*rn/n), a bounded sequence explode (total output
    exactly k per key, no second pass, no buffering). Ties need no
    tiebreak: row_number among equal values is nondeterministic but the
    VALUE at each rank of the sorted multiset is not, and only values
    are emitted.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(value)
    wc = Window.partitionBy(key)
    ranked = rows.select(
        key,
        F.col(value).alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    lo = F.expr(f"(CAST({k} AS BIGINT) * (rn - 1)) DIV n")
    hi = F.expr(f"(CAST({k} AS BIGINT) * rn) DIV n")
    return (
        ranked.filter(hi > lo)
        .select(
            key, "v",
            F.explode(F.sequence(lo + 1, hi)).alias("bin"),
        )
        .select(key, "bin", F.col("v").alias("boundary"))
    )


def benford_census(
    rows: DataFrame, key: str, value: str
) -> DataFrame:
    """Per-key first-significant-digit census — the Benford's-law audit
    (fraud/fabrication screening on naturally-spanning magnitudes; the
    distribution-shaped sibling of expectation_census's row predicates).
    Exact: the leading digit of a positive int64 is character 1 of its
    decimal rendering — no log10, no float, identical in any engine.
    Non-positive values are excluded (Benford is defined on magnitudes;
    documented, pinned in tests).  Returns (key, digit, n) with all
    nine digits present per observed key (zero-filled), so downstream
    chi-square/MAD comparisons never miss a bucket.

    Plan: one filter + one partial-aggregatable groupBy, then a 9-row
    digit frame joined per key (broadcast) for the zero-fill.
    """
    pos = rows.select(
        F.col(key).alias("key"), F.col(value).cast("bigint").alias("v")
    ).filter(F.col("v") > 0)
    obs = pos.select(
        "key",
        F.substring(F.col("v").cast("string"), 1, 1).cast("bigint")
        .alias("digit"),
    ).groupBy("key", "digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    digits = obs.sparkSession.range(1, 10).select(
        F.col("id").alias("digit")
    )
    keys = obs.select("key").distinct()
    frame = keys.crossJoin(F.broadcast(digits))
    return (
        frame.join(obs, ["key", "digit"], "left")
        .select(
            "key", "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    )


def gini_exact(rows: DataFrame, key: str, value: str) -> DataFrame:
    """Per-key exact Gini numerator — inequality/concentration profiling
    (how concentrated is spend/traffic/size within each key), the
    rank-weighted companion of equi_depth_bins.  With a key's n values
    sorted ascending (ties broken stably by the sort; the numerator is
    tie-order-invariant because equal values swap weights freely):

        gini_num = Σ_i (2i - n - 1) v_i        (i = 1..n, int64)
        G        = gini_num / (n Σv)           (presentation-time)

    Returns (key, n, sum_v, gini_num), exact.  Plan: ONE window sort
    per key + one partial-aggregatable groupBy; the 100 TB caveat is
    the usual skewed-key window (a single key's values colocate).
    """
    w = Window.partitionBy("key").orderBy("v")
    r = rows.select(
        F.col(key).alias("key"), F.col(value).cast("bigint").alias("v")
    ).select(
        "key", "v", F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("key")).alias("n"),
    )
    return r.groupBy("key").agg(
        F.max("n").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sum_v"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("v"))
        .cast("long").alias("gini_num"),
    )


def two_sample_ecdf(
    rows: DataFrame,
    key: str,
    group: str,
    value: str,
    group_a,
) -> DataFrame:
    """Exact two-sample ECDF comparison per key — Kolmogorov-Smirnov
    and Cramér-von Mises numerators with no float: the drift gate
    between two cohorts (yesterday-vs-today feature distributions,
    control-vs-treatment metrics) in the same exact-integer discipline
    as the rest of the audit family.

    Rows where `group` == group_a form sample A (sizes n_a), everything
    else sample B.  Clearing the ECDF denominators: at each distinct
    value v (right-continuous, ties resolved by evaluating AFTER the
    full tie group — the standard convention),

        d(v) = cumA(v) * n_b - cumB(v) * n_a     (= n_a*n_b*(F_A - F_B))

        ks_num  = max |d(v)|                       (D = ks_num/(n_a*n_b))
        cvm_num = Σ_v (c_a(v)+c_b(v)) * d(v)²      (pooled-weighted)

    Returns (key, n_a, n_b, ks_num, cvm_num), all int64 (overflow
    bound: |d| <= n_a*n_b, so cvm_num needs n*(n_a*n_b)² < 2^63 —
    fine to ~40k rows per key per side; shard or widen to DECIMAL
    beyond).

    Plan: one (key, value) hash pre-aggregate (the ONLY full-data
    shuffle), one cumulative window per key over DISTINCT values, one
    final aggregate — the islands/seasonal single-sort posture.
    """
    is_a = (F.col(group) == F.lit(group_a)).cast("bigint")
    lvl = (
        rows.select(
            F.col(key).alias("key"),
            F.col(value).cast("bigint").alias("v"),
            is_a.alias("a"),
        )
        .groupBy("key", "v")
        .agg(
            F.sum("a").alias("ca"),
            F.sum(F.lit(1) - F.col("a")).alias("cb"),
        )
    )
    w_cum = (
        Window.partitionBy("key").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("key")
    r = lvl.select(
        "key", "ca", "cb",
        F.sum("ca").over(w_cum).alias("cuma"),
        F.sum("cb").over(w_cum).alias("cumb"),
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    )
    d = F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")
    return (
        r.withColumn("d", d)
        .groupBy("key")
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.max(F.abs(F.col("d"))).cast("long").alias("ks_num"),
            F.sum((F.col("ca") + F.col("cb")) * F.col("d") * F.col("d"))
            .cast("long").alias("cvm_num"),
        )
    )


def mann_whitney_census(
    rows: DataFrame,
    key: str,
    group: str,
    value: str,
    group_a,
) -> DataFrame:
    """Exact Mann-Whitney U ingredients per key — the rank-sum
    two-sample location test next to two_sample_ecdf's distribution
    gate, in the same cleared-denominator integer discipline.

    Rows where `group` == group_a form sample A, everything else B.
    With ties, U_A = Σ_{a∈A, b∈B} ([a > b] + ½[a = b]); doubling
    clears the half:

        u2_a = Σ_v ca(v) * (2 * cumb(v-) + cb(v))

    where cumb(v-) counts B strictly below v.  The partner statistic
    u2_b follows from the identity u2_a + u2_b = 2 n_a n_b (asserted
    in tests, emitted for the consumer).  The tie correction needed by
    the normal approximation's variance is Σ (t³ - t) over pooled tie
    groups — also exact int64.

    Returns (key, n_a, n_b, u2_a, u2_b, tie_cube).  Overflow: u2 <=
    2 n_a n_b < 2^63 to ~2.1e9 rows per side; tie_cube <= n³.

    Plan: identical to two_sample_ecdf — one (key, value) hash
    pre-aggregate, one cumulative window over distinct values, one
    final aggregate; a second full-data shuffle never happens.
    """
    is_a = (F.col(group) == F.lit(group_a)).cast("bigint")
    lvl = (
        rows.select(
            F.col(key).alias("key"),
            F.col(value).cast("bigint").alias("v"),
            is_a.alias("a"),
        )
        .groupBy("key", "v")
        .agg(
            F.sum("a").alias("ca"),
            F.sum(F.lit(1) - F.col("a")).alias("cb"),
        )
    )
    w_cum = (
        Window.partitionBy("key").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("key")
    r = lvl.select(
        "key", "ca", "cb",
        (F.sum("cb").over(w_cum) - F.col("cb")).alias("cumb_lt"),
        (F.sum("ca").over(w_cum) - F.col("ca")).alias("cuma_lt"),
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    )
    t = F.col("ca") + F.col("cb")
    return r.groupBy("key").agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.sum(F.col("ca") * (2 * F.col("cumb_lt") + F.col("cb")))
        .cast("long").alias("u2_a"),
        F.sum(F.col("cb") * (2 * F.col("cuma_lt") + F.col("ca")))
        .cast("long").alias("u2_b"),
        F.sum(t * t * t - t).cast("long").alias("tie_cube"),
    )
