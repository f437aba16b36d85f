"""Bucketed snapshots: co-located joins with NO exchange on either side.

The north rule calls for explicit partitioning control; Spark's lever is
bucketed tables — two snapshots hash-bucketed identically sort-merge-join
without shuffling (the reference relies on identical MR partitioners
across job boundaries for the same effect)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from osm_hadoop_spark.sources.catalog import SnapshotCatalog


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_snapshots_join_without_exchange(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path / "cat"), use_iceberg=False)
    ways = spark.range(0, 2000).select(
        F.col("id").alias("way_id"), (F.col("id") % 7).alias("cls")
    )
    tags = spark.range(0, 2000).select(
        F.col("id").alias("way_id"),
        F.concat(F.lit("t"), (F.col("id") % 13).cast("string")).alias("tag"),
    )
    rec_a = cat.write(ways, "ways_b", bucket_by=(["way_id"], 8))
    rec_b = cat.write(tags, "tags_b", bucket_by=(["way_id"], 8))
    assert rec_a["bucket_by"] == {"cols": ["way_id"], "n": 8}
    assert rec_a["rows"] == 2000 and rec_b["rows"] == 2000

    a = cat.read("ways_b")
    b = cat.read("tags_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "way_id")
        plan = _plan(joined)
        # co-located: sort-merge join with ZERO shuffle exchanges
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 2000
        got = joined.filter(F.col("way_id") == 91).collect()[0]
        assert got["cls"] == 91 % 7 and got["tag"] == f"t{91 % 13}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # plain (non-bucketed) snapshots keep the old layout and record shape
    rec_c = cat.write(ways, "ways_plain")
    assert rec_c["bucket_by"] is None and rec_c["managed_name"] is None
    assert cat.read("ways_plain").count() == 2000


def test_bucketed_snapshot_survives_new_session(spark, tmp_path):
    """A new Spark session sees only the persisted _snapshots.json, not the
    in-memory session catalog — read() must fall back to the snapshot path
    (bucket metadata is lost across sessions on the parquet backend; the
    data is not)."""
    cat = SnapshotCatalog(spark, str(tmp_path / "cat2"), use_iceberg=False)
    df = spark.range(0, 500).select(
        F.col("id").alias("way_id"), (F.col("id") % 3).alias("cls")
    )
    rec = cat.write(df, "ways_x", bucket_by=(["way_id"], 4))
    # simulate a fresh session: drop the session-catalog entry, keep files
    spark.sql(f"DROP TABLE {rec['managed_name']}")
    fresh = SnapshotCatalog(spark, str(tmp_path / "cat2"), use_iceberg=False)
    got = fresh.read("ways_x")
    assert got.count() == 500
    assert got.filter(F.col("way_id") == 7).collect()[0]["cls"] == 1


def test_two_catalog_roots_do_not_collide(spark, tmp_path):
    """Same table name, same snapshot id, two roots: the managed session-
    catalog names must differ, or the second write re-points the first."""
    cat_a = SnapshotCatalog(spark, str(tmp_path / "rootA"), use_iceberg=False)
    cat_b = SnapshotCatalog(spark, str(tmp_path / "rootB"), use_iceberg=False)
    df_a = spark.range(0, 10).select(F.col("id").alias("way_id"),
                                     F.lit("A").alias("src"))
    df_b = spark.range(0, 20).select(F.col("id").alias("way_id"),
                                     F.lit("B").alias("src"))
    rec_a = cat_a.write(df_a, "shared", bucket_by=(["way_id"], 2))
    rec_b = cat_b.write(df_b, "shared", bucket_by=(["way_id"], 2))
    assert rec_a["managed_name"] != rec_b["managed_name"]
    assert cat_a.read("shared").count() == 10
    assert cat_b.read("shared").count() == 20
    assert cat_a.read("shared").select("src").distinct().collect()[0][0] == "A"
