"""Property tests for the from-scratch S2 cell index (functions/s2.py).

Three independent implementations must agree: the vectorized 4-bit
lookup walk (production), the per-level scalar walk (here), and the
recursive-CTE SQL twin (pinned by the s2_cell_assign_l12 driver oracle;
the DuckDB cross-check below samples the same lattice the exhaustive
54 400-point offline verification covered).
"""

from __future__ import annotations

import numpy as np
import pytest

from osm_hadoop_spark.functions import s2


@pytest.fixture(scope="module")
def rand_pts():
    rng = np.random.default_rng(7)
    return rng.uniform(-180, 180, 4000), rng.uniform(-90, 90, 4000)


def test_vectorized_equals_scalar_reference(rand_pts):
    lon, lat = rand_pts
    x, y, z = s2._xyz_from_lonlat(lon, lat)
    face, uu, vv = s2._face_uv(x, y, z)
    i = s2._ij_from_st(s2._st_from_uv(uu))
    j = s2._ij_from_st(s2._st_from_uv(vv))
    assert set(np.unique(face)) == set(range(6))  # all cube faces exercised
    vec = s2.cell_from_face_ij(face, i, j)
    sca = np.array(
        [
            s2._cell_from_face_ij_scalar(int(f), int(a), int(b))
            for f, a, b in zip(face, i, j)
        ]
    )
    assert (vec == sca).all()
    # and at a coarse level
    vec12 = s2.cell_from_face_ij(face[:500], i[:500], j[:500], 12)
    sca12 = np.array(
        [
            s2._cell_from_face_ij_scalar(int(f), int(a), int(b), 12)
            for f, a, b in zip(face[:500], i[:500], j[:500])
        ]
    )
    assert (vec12 == sca12).all()


def test_level_parent_range_containment(rand_pts):
    lon, lat = rand_pts
    leaf = s2.cell_for_lonlat(lon, lat, 30)
    assert (s2.cell_level(leaf) == 30).all()
    for lvl in (20, 12, 4, 0):
        p = s2.cell_parent(leaf, lvl)
        assert (s2.cell_level(p) == lvl).all()
        lo, hi = s2.cell_range_min(p), s2.cell_range_max(p)
        # descendant containment is a signed-int64 closed-interval test
        assert ((leaf >= lo) & (leaf <= hi)).all()
        # parent-of-parent commutes with direct computation
        assert (s2.cell_parent(leaf, lvl) == s2.cell_for_lonlat(lon, lat, lvl)).all()


def test_children_partition_parent(rand_pts):
    lon, lat = rand_pts
    cells = np.unique(s2.cell_for_lonlat(lon[:200], lat[:200], 10))
    for c in cells[:50]:
        kids = s2.cell_children(int(c))
        assert (s2.cell_level(kids) == 11).all()
        # children tile the parent's leaf range contiguously, in id order
        lo = s2.cell_range_min(kids)
        hi = s2.cell_range_max(kids)
        assert lo[0] == s2.cell_range_min(np.array([c]))[0]
        assert hi[-1] == s2.cell_range_max(np.array([c]))[0]
        # leaf ids are odd (sentinel bit 0), so adjacent ranges step by 2
        assert (lo[1:] == hi[:-1] + 2).all()


def _ij_at_level(face: int, pos: int, level: int):
    orient = face & 1
    i = j = 0
    for k in range(level):
        p = (pos >> (2 * (level - 1 - k))) & 3
        ij = int(s2._POS_TO_IJ[orient][p])
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient ^= int(s2._POS_TO_ORIENT[p])
    return i, j


def test_hilbert_continuity_all_faces():
    """Consecutive curve positions are 4-adjacent cells — the defining
    locality property (range-partitioning by id => spatial partitioner)."""
    level = 5
    for face in range(6):
        pts = [_ij_at_level(face, p, level) for p in range(1 << (2 * level))]
        for a, b in zip(pts, pts[1:]):
            assert abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1


def test_inverse_roundtrip_and_center(rand_pts):
    lon, lat = rand_pts
    x, y, z = s2._xyz_from_lonlat(lon, lat)
    face, uu, vv = s2._face_uv(x, y, z)
    i = s2._ij_from_st(s2._st_from_uv(uu))
    j = s2._ij_from_st(s2._st_from_uv(vv))
    leaf = s2.cell_from_face_ij(face, i, j)
    f2, i2, j2 = s2.cell_to_face_ij(leaf)
    assert (f2 == face).all() and (i2 == i).all() and (j2 == j).all()
    # center of a leaf re-assigns to the same leaf
    clon, clat = s2.cell_to_lonlat(leaf)
    assert (s2.cell_for_lonlat(clon, clat, 30) == leaf).all()


def test_poles_and_antimeridian():
    # poles land on faces 2 (+z) / 5 (-z) regardless of lon — no mercator
    # singularity (web-mercator tiles clip at +-85.05 deg; S2 does not),
    # and at moderate levels every pole lon collapses to one cell
    lons = np.array([0.0, 45.0, -120.0, 179.9])
    north = s2.cell_for_lonlat(lons, np.full(4, 90.0), 10)
    south = s2.cell_for_lonlat(lons, np.full(4, -90.0), 10)
    assert ((north.view(np.uint64) >> np.uint64(61)) == 2).all()
    assert ((south.view(np.uint64) >> np.uint64(61)) == 5).all()
    assert (np.unique(north).size == 1) and (np.unique(south).size == 1)
    # +-180 deg is a face-boundary seam: sin(+-pi) = +-1.2e-16, so the two
    # spellings land in ADJACENT leaf columns on face 3 (real s2geometry
    # behaves identically for S2LatLng(+-180) -> ToPoint). Pin: same face,
    # |delta i or j| <= 1 in leaf grid space.
    lat = np.array([10.0, -35.0])
    a = s2.cell_for_lonlat(np.full(2, 180.0), lat, 30)
    b = s2.cell_for_lonlat(np.full(2, -180.0), lat, 30)
    fa, ia, ja = s2.cell_to_face_ij(a)
    fb, ib, jb = s2.cell_to_face_ij(b)
    assert (fa == 3).all() and (fb == 3).all()
    assert (np.abs(ia - ib) <= 1).all() and (np.abs(ja - jb) <= 1).all()


def test_duckdb_oracle_crosscheck_sampled():
    """Cross-engine check of the recursive-CTE twin on a 1 000-point
    sample of the fixture lattice (the full 54 400-point lattice was
    verified exhaustively; this keeps the invariant pinned in CI)."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    rng = np.random.default_rng(3)
    lon = rng.integers(-170, 170, 1000).astype(np.float64)
    lat = rng.integers(-80, 80, 1000).astype(np.float64)
    np_ids = s2.cell_for_lonlat(lon, lat, 12)

    ijpos_rows = ",".join(
        f"({o},{ij},{int(s2._IJ_TO_POS[o][ij])})" for o in range(4) for ij in range(4)
    )
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"rid": np.arange(1000), "lon": lon, "lat": lat}))
    sql = f"""
WITH RECURSIVE
ijpos(orient, ij, pos) AS (VALUES {ijpos_rows}),
xyz AS (SELECT rid, cos(radians(lat))*cos(radians(lon)) AS x,
               cos(radians(lat))*sin(radians(lon)) AS y, sin(radians(lat)) AS z FROM pts),
fc AS (SELECT rid, x, y, z,
        CASE WHEN abs(x) > abs(y)
             THEN (CASE WHEN abs(x) > abs(z) THEN (CASE WHEN x >= 0 THEN 0 ELSE 3 END)
                        ELSE (CASE WHEN z >= 0 THEN 2 ELSE 5 END) END)
             ELSE (CASE WHEN abs(y) > abs(z) THEN (CASE WHEN y >= 0 THEN 1 ELSE 4 END)
                        ELSE (CASE WHEN z >= 0 THEN 2 ELSE 5 END) END) END AS face
       FROM xyz),
uv AS (SELECT rid, face,
   CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
             WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
   CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
             WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v FROM fc),
st AS (SELECT rid, face,
   CASE WHEN u >= 0 THEN 0.5*sqrt(1+3*u) ELSE 1-0.5*sqrt(1-3*u) END AS s,
   CASE WHEN v >= 0 THEN 0.5*sqrt(1+3*v) ELSE 1-0.5*sqrt(1-3*v) END AS t FROM uv),
ij AS (SELECT rid, face,
   CAST(least(greatest(floor(s*1073741824), 0), 1073741823) AS BIGINT) AS i,
   CAST(least(greatest(floor(t*1073741824), 0), 1073741823) AS BIGINT) AS j FROM st),
hil AS (
  SELECT rid, face, i, j, 29 AS k, face % 2 AS orient, CAST(0 AS HUGEINT) AS pos FROM ij
  UNION ALL
  SELECT h.rid, h.face, h.i, h.j, h.k - 1,
         xor(h.orient, CASE t.pos WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 0 END),
         h.pos * 4 + t.pos
  FROM hil h JOIN ijpos t
    ON t.orient = h.orient AND t.ij = ((h.i >> h.k) & 1) * 2 + ((h.j >> h.k) & 1)
  WHERE h.k >= 18
),
fin AS (SELECT rid, CAST(face AS HUGEINT) * 2305843009213693952
                    + pos * 137438953472 + 68719476736 AS uid
        FROM hil WHERE k = 17)
SELECT CAST(CASE WHEN uid >= 9223372036854775808
            THEN uid - 18446744073709551616 ELSE uid END AS BIGINT) AS s2
FROM fin ORDER BY rid
"""
    duck = con.execute(sql).fetchnumpy()["s2"].astype(np.int64)
    assert (duck == np_ids).all()


def test_spark_mapinpandas_assignment(spark):
    """The Spark-side surface: mapInPandas batch assignment groups
    identically to a driver-side NumPy computation."""
    import pandas as pd
    from pyspark.sql import functions as F

    n = 3000
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {"lon": rng.uniform(-180, 180, n), "lat": rng.uniform(-90, 90, n)}
    )
    df = spark.createDataFrame(pdf).repartition(8)

    def assign(batches):
        from osm_hadoop_spark.functions.s2 import cell_for_lonlat

        for b in batches:
            yield pd.DataFrame(
                {"cell": cell_for_lonlat(b["lon"].to_numpy(), b["lat"].to_numpy(), 9)}
            )

    got = (
        df.mapInPandas(assign, schema="cell bigint")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    exp_cells = s2.cell_for_lonlat(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 9)
    exp = (
        pd.Series(exp_cells).value_counts().rename_axis("cell").reset_index(name="n")
        .sort_values("cell").reset_index(drop=True)
    )
    assert (got["cell"].to_numpy() == exp["cell"].to_numpy()).all()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_hypothesis_validity_and_hierarchy():
    """For ANY (lon, lat, level): the id has the correct sentinel (level
    round-trips), a valid face, and parent containment holds at every
    coarser level."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        lon=st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
        lat=st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
        level=st.integers(min_value=0, max_value=30),
    )
    def check(lon, lat, level):
        ids = s2.cell_for_lonlat(np.array([lon]), np.array([lat]), level)
        assert s2.cell_level(ids)[0] == level
        face = ids.view(np.uint64) >> np.uint64(61)
        assert 0 <= face[0] <= 5
        leaf = s2.cell_for_lonlat(np.array([lon]), np.array([lat]), 30)
        for lvl in (0, level):
            p = s2.cell_parent(leaf, lvl)
            lo, hi = s2.cell_range_min(p), s2.cell_range_max(p)
            assert lo[0] <= leaf[0] <= hi[0]

    check()
