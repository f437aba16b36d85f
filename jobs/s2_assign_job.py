"""Production-style spark-submit job: interleaved documents -> S2 cells.

This is the ship path the north rule names ("run via spark-submit
--py-files"): launched by tools/submit.sh, which packages the library zip
and passes it with --py-files. Nothing here touches the repo checkout —
`osm_hadoop_spark` must be importable ONLY from the shipped zip, on the
driver (spark-submit prepends --py-files to the driver's sys.path) and on
every executor Python worker (tested end-to-end by
tests/test_spark_submit.py running this file as a subprocess from a
foreign cwd with a scrubbed PYTHONPATH).

Pipeline: span documents (generated deterministically, or --input parquet
of the mandated (doc_id, spans) shape) -> JVM span parse (parse_nodes) ->
vectorized S2 cell assignment at --level -> per-cell count -> parquet.

The session is built with the plain builder, NOT get_spark(): under
spark-submit the package lives in a zip (no directory to re-zip), and
--py-files already distributes it; all tuning comes from submit.sh
--conf flags, the production norm.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True, help="parquet output directory")
    ap.add_argument("--input", default=None,
                    help="parquet of (doc_id, spans) documents; generated if absent")
    ap.add_argument("--rows", type=int, default=2000,
                    help="documents to generate when --input is absent")
    ap.add_argument("--level", type=int, default=10, help="S2 cell level")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("osm-spark-s2-assign").getOrCreate()

    import pandas as pd

    from osm_hadoop_spark.sources.fixtures import gen_documents
    from osm_hadoop_spark.sources.spans import parse_nodes

    docs = (
        spark.read.parquet(args.input)
        if args.input
        else gen_documents(spark, args.rows)
    )
    nodes = parse_nodes(docs)
    level = args.level

    def assign(batches):
        from osm_hadoop_spark.functions.s2 import cell_for_lonlat

        for b in batches:
            yield pd.DataFrame(
                {
                    "s2_cell": cell_for_lonlat(
                        b["lon"].to_numpy(), b["lat"].to_numpy(), level
                    )
                }
            )

    counts = (
        nodes.mapInPandas(assign, schema="s2_cell bigint")
        .groupBy("s2_cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    counts.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
