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

from pyspark.sql import DataFrame
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
