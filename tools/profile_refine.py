"""Ad-hoc profiling of the z10 cover+refine physical strategies (round 5).

Times, in one JVM with the assembled ways cached: cover-only explode, the
jvm segment-explode refine, and the Arrow kernel refine, interleaved.
Not part of the test suite; kept because it documents how the round-5
refine reshape was measured (see PARITY.md).
"""
import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from osm_hadoop_spark.session import get_spark  # noqa: E402
from osm_hadoop_spark.operators.tile_join import assign_tiles  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ZOOM = int(os.environ.get("PROFILE_ZOOM", "10"))

spec = importlib.util.spec_from_file_location(
    "entry_prof", os.path.join(REPO, "__spark_entry__.py"))
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

spark = get_spark("profile-refine", master="local[32]", shuffle_partitions=32)
ways = m._local_ways_geom(spark, SF_DIR)
ways.count()  # materialize the persist

variants = {
    "cover_jvm": lambda: assign_tiles(ways, zoom=ZOOM, tms=False, refine=False,
                                      cover_impl="jvm"),
    "refine_jvm": lambda: assign_tiles(ways, zoom=ZOOM, tms=False, refine=True,
                                       cover_impl="jvm"),
    "refine_arrow": lambda: assign_tiles(ways, zoom=ZOOM, tms=False, refine=True),
}
for name, fn in variants.items():  # warmup
    fn().count()
for rep in range(4):
    for name, fn in variants.items():
        t0 = time.time()
        c = fn().count()
        print(f"rep{rep} {name}: {time.time()-t0:.3f}s  rows={c}", flush=True)
spark.stop()
