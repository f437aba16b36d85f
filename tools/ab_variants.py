"""Ad-hoc (spark, sf_dir) -> DataFrame variants for `bench.py --ab`.

The --ab harness resolves `module:callable` specs; this module hosts
implementation variants kept around for interleaved same-JVM regression
measurement (the only trustworthy comparison on a host with multi-minute
5x performance windows — see BENCH/NOTES.md).
"""

from pyspark.sql import functions as F


def _neardup_corpus(spark, sf_dir):
    import os

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    pert = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.zip_with(
            "embedding", F.reverse("embedding"), lambda x, y: x + 0.5 * y
        ).alias("embedding"),
    )
    return emb.unionByName(pert)


def _neardup(spark, sf_dir, mode):
    from osm_hadoop_spark.operators.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _neardup_corpus(spark, sf_dir),
        threshold_num=4, threshold_den=5, dim=64, n_planes=8,
        probe_mode=mode,
    )


def neardup_slim(spark, sf_dir):
    return _neardup(spark, sf_dir, "slim")


def neardup_explode(spark, sf_dir):
    return _neardup(spark, sf_dir, "explode")
