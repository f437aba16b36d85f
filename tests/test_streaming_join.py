"""Stream-stream watermarked interval join (streaming/joins.py):
stream result equals the batch interval join on the same files."""

import pyspark.sql.functions as F


def test_stream_stream_attribution_equals_batch(spark, tmp_path):
    from osm_hadoop_spark.streaming.joins import interval_attribution_join

    base = 1700000000
    views = spark.createDataFrame(
        [(u, base + t) for u in range(20) for t in (0, 300, 900)],
        "user_id bigint, sec bigint",
    ).select("user_id", F.timestamp_seconds("sec").alias("l_ts"))
    clicks = spark.createDataFrame(
        [(u, base + t) for u in range(20) for t in (100, 350, 2000)],
        "user_id bigint, sec bigint",
    ).select("user_id", F.timestamp_seconds("sec").alias("r_ts"))

    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    views.write.parquet(vsrc)
    clicks.write.parquet(csrc)

    vs = spark.readStream.schema(views.schema).parquet(vsrc)
    cs = spark.readStream.schema(clicks.schema).parquet(csrc)
    out = interval_attribution_join(vs, cs, max_delay="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("attr_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["l_ts"], r["r_ts"])
        for r in spark.sql("SELECT * FROM attr_stream").collect()
    }

    batch = {
        (r["user_id"], r["l_ts"], r["r_ts"])
        for r in views.alias("v").join(
            clicks.alias("c"),
            (F.col("v.user_id") == F.col("c.user_id"))
            & (F.col("c.r_ts") > F.col("v.l_ts"))
            & (F.col("c.r_ts") <= F.col("v.l_ts") + F.expr("INTERVAL 10 minutes")),
        ).select("v.user_id", "l_ts", "r_ts").collect()
    }
    assert got == batch
    # sanity: each user matches view@0->click@100,350 and view@300->click@350
    assert len(batch) == 20 * 3
