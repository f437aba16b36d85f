"""Bucketed content checksum + Merkle-style snapshot diff."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}", "en") for i in range(50)],
        "doc_id long, text string, lang string",
    )


def test_checksum_identical_tables_reconcile(spark):
    from osm_hadoop_spark.operators.reconcile import checksum_diff, table_checksum

    a = table_checksum(_docs(spark), "doc_id", ["doc_id", "text", "lang"], 16)
    # same content, different physical order/partitioning -> same checksums
    b = table_checksum(
        _docs(spark).repartition(7).sortWithinPartitions(F.desc("text")),
        "doc_id", ["doc_id", "text", "lang"], 16,
    )
    assert checksum_diff(a, b).count() == 0


def test_diff_localizes_damage(spark):
    from osm_hadoop_spark.operators.reconcile import checksum_diff, table_checksum
    from osm_hadoop_spark.operators.textstats import h60

    docs = _docs(spark)
    mutated = docs.where(F.col("doc_id") != 11).select(
        "doc_id",
        F.when(F.col("doc_id") == 7, F.lit("tampered")).otherwise(
            F.col("text")
        ).alias("text"),
        "lang",
    )
    cs = lambda d: table_checksum(d, "doc_id", ["doc_id", "text", "lang"], 16)  # noqa: E731
    diff = {r["bucket"]: r["status"] for r in
            checksum_diff(cs(docs), cs(mutated)).collect()}

    # expected damaged buckets, derived with the same shared hash
    [exp] = docs.where(F.col("doc_id").isin(7, 11)).select(
        F.collect_list(
            F.struct("doc_id", (h60(F.col("doc_id").cast("string")) % 16))
        )
    ).first()
    want = {int(e[1]): ("count" if e[0] == 11 else "content") for e in exp}
    assert diff == want


def test_checksum_is_one_aggregate(spark):
    """One scan, partial-aggregatable: the plan must show a partial +
    final HashAggregate pair over a single scan, no join/window."""
    from osm_hadoop_spark.operators.reconcile import table_checksum

    plan = (
        table_checksum(_docs(spark), "doc_id", ["doc_id", "text"], 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") == 2
    assert "Join" not in plan and "Window" not in plan
