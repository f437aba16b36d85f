"""Spatially-clustered layout: disjoint per-file cell ranges, balance,
and the pruning arithmetic the manifest enables."""

import numpy as np
from pyspark.sql import functions as F

from osm_hadoop_spark.sources.layout import write_spatially_clustered


def _pts_df(spark, n=4000, seed=3):
    import pandas as pd

    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-85, 85, n)
    rows = [(i, float(lon[i]), float(lat[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")

    def assign(batches):
        from osm_hadoop_spark.functions.s2 import cell_for_lonlat

        for pdf in batches:
            pdf = pdf.assign(
                cell=cell_for_lonlat(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 12)
            )
            yield pdf

    return df.mapInPandas(assign, schema="id long, lon double, lat double, cell long")


def test_file_ranges_disjoint_and_balanced(spark, tmp_path):
    df = _pts_df(spark)
    man = write_spatially_clustered(df, str(tmp_path / "clustered"), "cell", 8).collect()
    assert len(man) == 8
    spans = sorted((r["min_cell"], r["max_cell"], r["n_rows"]) for r in man)
    for (lo1, hi1, _), (lo2, _, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file cell ranges overlap — clustering broken"
    rows = [n for _, _, n in spans]
    # range partitioner samples the distribution: files stay balanced
    assert max(rows) <= 3 * min(rows), rows
    assert sum(rows) == 4000


def test_manifest_prunes_query_ranges(spark, tmp_path):
    df = _pts_df(spark)
    man = write_spatially_clustered(df, str(tmp_path / "c2"), "cell", 8).collect()
    cells = sorted(r["cell"] for r in df.select("cell").collect())
    # a narrow cell-range query (one S2 Hilbert run = spatial locality)
    q_lo, q_hi = cells[100], cells[400]
    touched = [r for r in man if not (r["max_cell"] < q_lo or r["min_cell"] > q_hi)]
    assert 1 <= len(touched) <= 3, (len(touched), "pruning should skip most files")
    # the untouched files must contain NO matching rows (pruning is sound)
    skipped = {r["file"] for r in man} - {r["file"] for r in touched}
    full = (
        spark.read.parquet(str(tmp_path / "c2"))
        .withColumn("file", F.input_file_name())
        .filter((F.col("cell") >= q_lo) & (F.col("cell") <= q_hi))
    )
    assert full.filter(F.col("file").isin(list(skipped))).count() == 0
