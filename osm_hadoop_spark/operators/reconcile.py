"""Table reconciliation: bucketed order-free content checksums + diff.

Engine utility for migrations and replication audits — exactly the
problem this repo's own correctness gate solves (does engine A's table
equal engine B's?) but at a scale where collecting or row-joining both
sides is off the table. Standard anti-entropy shape (Merkle-bucket,
Cassandra/Dynamo lineage):

  checksum:  bucket = h(key) mod B; per bucket emit (n_rows,
             XOR of a 60-bit row-content hash).  XOR is commutative,
             associative, self-inverse — order- and partitioning-free,
             no overflow, and partial-aggregatable, so the whole
             checksum is ONE map-side-combinable aggregate producing B
             slim rows from any table size.
  diff:      full-outer-join the two B-row summaries on bucket; only
             buckets whose (n_rows, xor) differ need row-level repair,
             so the expensive comparison is confined to mismatched
             buckets (re-run with a finer B over just those key ranges
             — the Merkle descent).

Caveat pinned in tests: XOR cannot see a row REPLACING another row an
even number of times or a pair of duplicate rows toggling together;
carrying n_rows alongside catches the count-changing cases, and the
row hash covers all compared columns so any value change flips the
bucket with probability 1 - 2^-60.

100 TB posture: one scan, one tiny shuffle of B rows per table; the
diff join is B-vs-B (broadcast). This is the cheapest possible
cross-snapshot integrity check that still localizes damage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


def table_checksum(
    df: DataFrame, key: str, cols: list[str], buckets: int = 64
) -> DataFrame:
    """DataFrame(bucket, n_rows, xor60) — per-bucket count + XOR of the
    60-bit hash of the canonical '|'-joined string rendering of `cols`
    (caller casts non-string columns; NULL renders as the empty slot,
    distinct from the string 'null' only if the caller encodes it).
    Bucket = h60(key) mod B so bucket membership is content-derived and
    identical across engines and partitionings."""
    canon = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    return (
        df.select(
            (h60(F.col(key).cast("string")) % buckets).alias("bucket"),
            h60(canon).alias("_rh"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(_rh)").alias("xor60"),
        )
    )


def checksum_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """DataFrame(bucket, n_rows_a, n_rows_b, xor_a, xor_b, status) for
    buckets that DIFFER between two `table_checksum` outputs; status is
    'count' when row counts diverge, else 'content'. Empty result ==
    tables reconcile at this bucket granularity."""
    an = a.select(
        "bucket", F.col("n_rows").alias("n_rows_a"), F.col("xor60").alias("xor_a")
    )
    bn = b.select(
        "bucket", F.col("n_rows").alias("n_rows_b"), F.col("xor60").alias("xor_b")
    )
    j = an.join(bn, "bucket", "full_outer")
    return j.where(
        ~(
            F.col("n_rows_a").eqNullSafe(F.col("n_rows_b"))
            & F.col("xor_a").eqNullSafe(F.col("xor_b"))
        )
    ).select(
        "bucket",
        "n_rows_a",
        "n_rows_b",
        "xor_a",
        "xor_b",
        F.when(
            ~F.col("n_rows_a").eqNullSafe(F.col("n_rows_b")), F.lit("count")
        )
        .otherwise(F.lit("content"))
        .alias("status"),
    )
