"""Probe scaling-relevant knobs on the flagship (round 5, one-off).

Variants x {local[2], local[8]} at SCALING-style 6M docs, warm iters in
one JVM per (variant, level): baseline / 4x shuffle partitions /
shuffled-hash join / both. Prints per-cell warm-best and the efficiency.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = """
import sys, time, os; sys.path.insert(0, %(repo)r)
import bench
from pyspark.sql import functions as F
from osm_hadoop_spark.session import get_spark
bench.use_tmpfs_shuffle_dir()
cpus = %(cpus)d
sp = %(sp)d
spark = get_spark("probe", master=f"local[{cpus}]", shuffle_partitions=sp)
if %(shj)d:
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
path = bench.ensure_docs_parquet(spark, 6000000)
ts = []
for i in range(3):
    t0 = time.time()
    bench.flagship_pipeline(spark, path).collect()
    ts.append(round(time.time() - t0, 2))
print("RESULT", ts, flush=True)
spark.stop()
"""

for name, spx, shj in (("base", 1, 0), ("p4x", 4, 0), ("shj", 1, 1), ("p4x+shj", 4, 1)):
    best = {}
    for cpus in (2, 8):
        code = CHILD % {"repo": REPO, "cpus": cpus, "sp": spx * cpus, "shj": shj}
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=1800, cwd=REPO)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        ts = json.loads(line[0][7:]) if line else None
        best[cpus] = min(ts[1:]) if ts else float("nan")
        print(f"{name} local[{cpus}]: {ts}", flush=True)
    eff = (best[2] / best[8]) / 4
    print(f"{name}: eff={eff:.3f} (lo {best[2]} hi {best[8]})", flush=True)
