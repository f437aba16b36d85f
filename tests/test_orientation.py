import importlib.util
import math
import random

spec = importlib.util.spec_from_file_location("entry_t", "/root/repo/__spark_entry__.py")
_entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_entry)


def _atan2_sector(dx, dy):
    """Independent classification: true angle, boundaries belong to the
    upper sector (epsilon-nudged; exact int inputs are never within
    1e-9 deg of a boundary unless ON it)."""
    deg = math.degrees(math.atan2(dy, dx)) % 360.0
    return int((deg + 1e-9) // 45) % 8


def test_octant_case_matches_atan2(spark):
    from pyspark.sql import functions as F

    rng = random.Random(23)
    segs = [(rng.randrange(-9, 10), rng.randrange(-9, 10)) for _ in range(300)]
    segs = [s for s in segs if s != (0, 0)]
    # every axis and diagonal tie, explicitly
    segs += [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1),
             (5, 5), (-7, 7), (-3, -3), (4, -4)]
    df = spark.createDataFrame(segs, "dx: long, dy: long")
    out = df.select("dx", "dy",
                    F.expr(_entry._octant_case("dx", "dy")).alias("o")).collect()
    for r in out:
        assert r["o"] == _atan2_sector(r["dx"], r["dy"]), (r["dx"], r["dy"])


def test_octant_case_is_total(spark):
    # exhaustive small grid: every nonzero (dx, dy) gets exactly one
    # sector in 0..7
    from pyspark.sql import functions as F

    segs = [(dx, dy) for dx in range(-4, 5) for dy in range(-4, 5)
            if (dx, dy) != (0, 0)]
    df = spark.createDataFrame(segs, "dx: long, dy: long")
    out = df.select(F.expr(_entry._octant_case("dx", "dy")).alias("o")).collect()
    assert all(0 <= r["o"] <= 7 for r in out)
