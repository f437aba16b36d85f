"""Driver-mimicking oracle checker.

Runs every `queries()` entry on Spark and its `oracle_sql()` twin on DuckDB
over the same parquet dir, compares row count, column names, and
order-insensitive values (sorted by all columns). Usage:

    python tools/check_oracles.py [sf_dir] [only_query_name ...]
"""

from __future__ import annotations

import importlib.util
import math
import sys

import duckdb

REPO = "/root/repo"
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load_entry():
    spec = importlib.util.spec_from_file_location("entry_mod", f"{REPO}/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v!r}"
    return v


def compare(name, spark_rows, duck_rows, spark_cols, duck_cols):
    if [c.lower() for c in spark_cols] != [c.lower() for c in duck_cols]:
        return f"SCHEMA MISMATCH spark={spark_cols} duck={duck_cols}"
    if len(spark_rows) != len(duck_rows):
        return f"ROWCOUNT MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
    a = sorted([tuple(norm_cell(v) for v in r) for r in spark_rows])
    b = sorted([tuple(norm_cell(v) for v in r) for r in duck_rows])
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        only_a = [r for r in a if r not in set(b)][:2]
        return f"VALUE MISMATCH first diffs={diffs} spark-only={only_a}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # derived oracles (ann_ivf centroid literals) rebuild constants from the
    # parquet under test — point them at the same sf_dir we compare against
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from osm_hadoop_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    m = load_entry()
    qs = m.queries()
    oracles = m.oracle_sql()
    failures = 0
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_rows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        err = compare(name, spark_rows, duck_rows, spark_cols, duck_cols)
        dt = time.time() - t0
        if err:
            print(f"FAIL  {name}: {err}", flush=True)
            failures += 1
        else:
            print(f"OK    {name}: {len(spark_rows)} rows ({dt:.1f}s)", flush=True)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
