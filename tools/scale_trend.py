"""Scale-trend run (round-4 VERDICT item 6): flagship at 1.5M vs 15M docs.

One solo JVM per scale at local[32]; per-stage wall times measured as
cumulative cuts of the flagship chain (each cut materialized with a
count/agg action on a FRESH build so persists don't leak between cuts):

  parse     span parse -> slim entity union (the single documents scan)
  assembly  + F1 filter + J1 node join + J2 way assembly (ways_geom)
  e2e       + z14 segment-explode cover+refine + per-tile counts

plus the (way, tile) pair shuffle's partition balance (rows per shuffle
partition, max/mean) at both scales — the number that would degrade if
the tile key distribution stopped scaling.

Usage: python tools/scale_trend.py [n_docs ...]   (default 1500000 15000000)
Appends a row to stdout as JSON; the NOTES.md row is written by hand from
the output (one-off artifact).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_scale(n_docs: int) -> dict:
    """Fresh JVM per scale (subprocess-free: caller runs one scale per
    process when isolation matters; here one JVM reused is fine since the
    cuts rebuild from parquet each time)."""
    import bench
    from osm_hadoop_spark.session import get_spark
    from osm_hadoop_spark.operators.tile_join import assign_tiles, tile_counts
    from osm_hadoop_spark.sources import spans as S
    from osm_hadoop_spark.operators.way_assembly import build_ways_geom

    bench.use_tmpfs_shuffle_dir()
    spark = get_spark(f"scale-trend-{n_docs}", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    path = bench.ensure_docs_parquet(spark, n_docs)
    docs = spark.read.parquet(path)
    out = {"n_docs": n_docs}

    t0 = time.time()
    n_ent = S.parse_entities(docs).agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
    out["parse_sec"] = round(time.time() - t0, 2)
    out["n_entities"] = int(n_ent)

    t0 = time.time()
    wg = build_ways_geom(docs, tag_keys=["highway"])
    out["n_ways"] = wg.count()
    out["assembly_sec"] = round(time.time() - t0, 2)
    # keep the persisted entity frame for the e2e cut? No — rebuild, so
    # e2e measures the whole chain like bench.py does
    spark.catalog.clearCache()

    t0 = time.time()
    wg = build_ways_geom(docs, tag_keys=["highway"])
    assigned = assign_tiles(wg, zoom=14, tms=False, cover_impl="jvm")
    row = tile_counts(assigned).agg(
        F.count(F.lit(1)).alias("n_tiles"), F.sum("n_ways").alias("n_pairs")
    ).collect()[0]
    out["e2e_sec"] = round(time.time() - t0, 2)
    out["n_tiles"], out["n_pairs"] = int(row["n_tiles"]), int(row["n_pairs"])
    out["docs_per_sec"] = round(n_docs / out["e2e_sec"], 1)

    # pair-shuffle balance: rows per shuffle partition on the tile key
    bal = (
        assigned.groupBy(F.pmod(F.hash("tile_id"), F.lit(CPUS)).alias("p"))
        .count().collect()
    )
    counts = [r["count"] for r in bal]
    out["pair_shuffle_max_over_mean"] = round(
        max(counts) / (sum(counts) / CPUS), 2
    )
    spark.catalog.clearCache()
    spark.stop()
    return out


def main():
    scales = [int(x) for x in sys.argv[1:] if x.isdigit()] or [1_500_000, 15_000_000]
    rows = []
    for n in scales:
        log(f"scale-trend: {n} docs")
        r = run_scale(n)
        log(f"scale-trend: {r}")
        rows.append(r)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
