"""Deterministic synthetic fixtures (seed=42, no external data).

Implements FIXTURES.md: the interleaved-document table carrying OSM entity
payloads, the db-snapshot golden micro-fixture, boundary polygons,
pre-tagged ways, raster strips, and the skewed variant.

Determinism contract: every value derives from splitmix64 hashes of
(entity id, field salt) — generation is partition-invariant and identical
at any scale factor prefix (doc k looks the same whether n_docs is 1e3 or
1e9). Generation is fixture/bench tooling, NOT the measured hot path: the
engine consumes the written Parquet/Iceberg table.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from osm_hadoop_spark.sources.spans import DOCUMENTS_SCHEMA

_GOLDEN = 0x9E3779B97F4A7C15
_SEED_DEFAULT = 42

_WORDS = (
    "forest road river tile pixel raster vector node way relation span "
    "document media image audio text osm planet extract boundary polygon "
    "line point cell index join shuffle partition skew salt broadcast"
).split()

HIGHWAY_VALUES = [
    "motorway", "trunk", "primary", "secondary", "tertiary", "motorway link",
    "primary link", "unclassified", "road", "residential", "service", "track",
    "pedestrian", "footway", "path",  # footway/path exercise default class 15
]

# relation member roles (db-snapshot.osm:44-49 uses wayrole1/wayrole2;
# the synthetic corpus draws from route-style roles)
_REL_ROLES = ["outer", "inner", "main", "alternative"]


def _mix64(v: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over (v + salt*golden); vectorized, uint64.

    uint64 wraparound is the point — suppress numpy's overflow warnings."""
    with np.errstate(over="ignore"):
        z = (np.asarray(v, dtype=np.uint64) + np.uint64(salt) * np.uint64(_GOLDEN)) * np.uint64(_GOLDEN)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _u01(v: np.ndarray, salt: int) -> np.ndarray:
    return _mix64(v, salt).astype(np.float64) / float(2**64)


_NODES_PER_CELL = 64  # consecutive node ids share a ~0.5-degree cell


def node_coords(node_ids: np.ndarray, seed: int = _SEED_DEFAULT, skew: bool = False):
    """Deterministic, LOCALITY-PRESERVING (lon, lat) per node id.

    Consecutive node ids land in the same ~0.5-degree cell (cell = id/64,
    cell center hashed onto the globe, offset hashed within the cell), so
    ways built from contiguous id windows are geographically local like real
    OSM ways — a world-spanning synthetic way would make fixed-zoom tile
    covers quadratically explode, which no real workload exhibits.
    Skew variant relocates 50% of nodes into one dense cell
    (FIXTURES.md section 7)."""
    nid = np.asarray(node_ids, dtype=np.uint64)
    cell = (nid - np.uint64(1)) // np.uint64(_NODES_PER_CELL)  # ids are 1-based
    lon = _u01(cell, seed * 1000 + 1) * 358.0 - 179.5
    lat = _u01(cell, seed * 1000 + 2) * 167.0 - 83.5
    lon = lon + _u01(nid, seed * 1000 + 4) * 0.1
    lat = lat + _u01(nid, seed * 1000 + 5) * 0.1
    if skew:
        # relocate whole CELLS (not single nodes) so ways stay local while
        # ~50% of all geometry piles into one dense ~0.05-degree area
        dense = _mix64(cell, seed * 1000 + 6) % np.uint64(2) == 0
        lon = np.where(dense, 2.30 + _u01(nid, seed * 1000 + 7) * 0.05, lon)
        lat = np.where(dense, 48.85 + _u01(nid, seed * 1000 + 8) * 0.05, lat)
    return lon, lat


def way_nds(way_id: int, n_nodes: int, seed: int = _SEED_DEFAULT, skew: bool = False) -> list[int]:
    """Deterministic nd list (2..8 node refs) for a way: a contiguous window
    around a hashed base id, so the way is geographically local (see
    node_coords) while its nodes still live in OTHER documents (J1 remains a
    genuine cross-document shuffle)."""
    w = np.uint64(way_id)
    n = 2 + int(_mix64(w, seed * 2000 + 1) % np.uint64(7))
    n_cells = max(n_nodes // _NODES_PER_CELL, 1)
    cell = int(_mix64(w, seed * 2000 + 2) % np.uint64(n_cells))
    steps = _mix64(w + np.arange(n, dtype=np.uint64) * np.uint64(1315423911),
                   seed * 2000 + 4) % np.uint64(_NODES_PER_CELL)
    # 1-based ids: cell c owns ids [c*64+1, (c+1)*64] (matches node_coords)
    nds = np.minimum(cell * _NODES_PER_CELL + steps.astype(np.int64) + 1, n_nodes)
    out = nds.tolist()
    if skew and int(_mix64(w, seed * 2000 + 3) % np.uint64(10)) < 3:
        out[0] = 1  # viral node 1 appears in ~30% of ways
    return out


def docs_pandas(ids: np.ndarray, n_docs: int, seed: int = _SEED_DEFAULT, skew: bool = False) -> pd.DataFrame:
    """Build the interleaved-document rows for a batch of 0-based doc indexes.

    Layout: doc d always carries node (d+1); every 4th doc also carries way
    (d//4 + 1) whose nds hash into the GLOBAL node id space — so the J1 join
    is a genuine cross-document shuffle. Every 16th doc carries relation
    (d//16 + 1) with one node member plus 2-4 way members hashed into the
    global way id space (cross-document again, one level up). 0-4 text/media
    noise spans are interleaved deterministically; offsets are the final
    span positions.
    """
    ids = np.asarray(ids, dtype=np.uint64)
    rows = []
    for d in ids.tolist():
        spans: list[dict] = []
        nid = d + 1
        lon, lat = node_coords(np.array([nid], dtype=np.uint64), seed, skew)
        spans.append({
            "kind": "osm.node",
            "text": json.dumps({"id": int(nid), "lon": float(lon[0]), "lat": float(lat[0])},
                               separators=(",", ":")),
            "media_ref": None,
        })
        if d % 4 == 0:
            wid = d // 4 + 1
            hv = HIGHWAY_VALUES[int(_mix64(np.uint64(wid), seed * 3000 + 1) % np.uint64(len(HIGHWAY_VALUES)))]
            tagged = int(_mix64(np.uint64(wid), seed * 3000 + 2) % np.uint64(10)) < 8
            tags = {"highway": hv} if tagged else {"building": "yes"}
            spans.append({
                "kind": "osm.way",
                "text": json.dumps(
                    {"id": int(wid), "tags": tags, "nds": way_nds(int(wid), n_docs, seed, skew)},
                    separators=(",", ":")),
                "media_ref": None,
            })
        if d % 16 == 0:
            rid = d // 16 + 1
            n_ways = max(n_docs // 4, 1)
            n_m = 2 + int(_mix64(np.uint64(rid), seed * 5000 + 1) % np.uint64(3))
            refs = (_mix64(np.uint64(rid) + np.arange(n_m, dtype=np.uint64) * np.uint64(2654435761),
                           seed * 5000 + 2) % np.uint64(n_ways)).astype(np.int64) + 1
            members = [{"type": "node", "ref": int(nid), "role": "noderole"}]
            members += [{"type": "way", "ref": int(r),
                         "role": _REL_ROLES[int(_mix64(np.uint64(rid * 8 + j), seed * 5000 + 3)
                                                 % np.uint64(len(_REL_ROLES)))]}
                        for j, r in enumerate(refs.tolist())]
            spans.append({
                "kind": "osm.relation",
                "text": json.dumps(
                    {"id": int(rid), "tags": {"type": "route"}, "members": members},
                    separators=(",", ":")),
                "media_ref": None,
            })
        n_noise = int(_mix64(np.uint64(d), seed * 3000 + 3) % np.uint64(5))
        for j in range(n_noise):
            h = int(_mix64(np.uint64(d * 16 + j), seed * 3000 + 4))
            if h % 3 == 0:
                spans.append({"kind": "media", "text": None,
                              "media_ref": f"media://{h % 100000:05d}"})
            else:
                words = [_WORDS[(h >> (5 * k)) % len(_WORDS)] for k in range(3 + h % 6)]
                spans.append({"kind": "text", "text": " ".join(words), "media_ref": None})
        # deterministic interleave, then offsets = final positions
        order = np.argsort(_mix64(np.uint64(d) * np.uint64(64) + np.arange(len(spans), dtype=np.uint64),
                                  seed * 3000 + 5), kind="stable")
        spans = [spans[i] for i in order]
        for pos, s in enumerate(spans):
            s["offset"] = pos
        rows.append({"doc_id": f"doc-{d:08d}", "spans": spans})
    return pd.DataFrame(rows, columns=["doc_id", "spans"])


def gen_documents(spark: SparkSession, n_docs: int, seed: int = _SEED_DEFAULT,
                  skew: bool = False, partitions: int | None = None) -> DataFrame:
    """Distributed generator: scales to bench sizes via mapInPandas."""
    n_parts = partitions or max(1, min(64, n_docs // 5000 + 1))
    base = spark.range(0, n_docs, 1, n_parts)

    def build(batches):
        for pdf in batches:
            yield docs_pandas(pdf["id"].to_numpy(), n_docs, seed, skew)

    return base.mapInPandas(build, schema=DOCUMENTS_SCHEMA)


# ---------------------------------------------------------------------------
# Golden micro-fixture (FIXTURES.md section 2 — mirrors db-snapshot.osm)
# ---------------------------------------------------------------------------

def gen_db_snapshot_documents(spark: SparkSession) -> DataFrame:
    """Nodes 1..6 at (-2,-1)...(-12,-11); ways 1->[1,2,3], 2->[2,3,4],
    3->[3,4,5], 4->[1] — way 4 must be dropped by F5 (WayBuilder.scala:95).
    Relation 1 -> [node 6 (noderole), way 1 (wayrole1), way 2 (wayrole2)]
    mirrors db-snapshot.osm:44-49 member-for-member. Entities deliberately
    spread across documents with noise spans."""
    nodes = {i: (-2.0 * i, -(2.0 * i - 1.0)) for i in range(1, 7)}
    ways = {1: [1, 2, 3], 2: [2, 3, 4], 3: [3, 4, 5], 4: [1]}
    tags = {1: {"highway": "residential"}, 2: {"highway": "trunk"},
            3: {"highway": "path"}, 4: {"highway": "service"}}

    def node_span(i):
        return {"kind": "osm.node", "media_ref": None,
                "text": json.dumps({"id": i, "lon": nodes[i][0], "lat": nodes[i][1]},
                                   separators=(",", ":"))}

    def way_span(w):
        return {"kind": "osm.way", "media_ref": None,
                "text": json.dumps({"id": w, "tags": tags[w], "nds": ways[w]},
                                   separators=(",", ":"))}

    docs = [
        ("doc-00000000", [{"kind": "text", "text": "osm extract header", "media_ref": None},
                          node_span(1), node_span(2)]),
        ("doc-00000001", [node_span(3), {"kind": "media", "text": None,
                                         "media_ref": "media://00001"}, node_span(4)]),
        ("doc-00000002", [node_span(5), node_span(6),
                          {"kind": "text", "text": "trailing prose", "media_ref": None}]),
        ("doc-00000003", [way_span(1), way_span(2)]),
        ("doc-00000004", [{"kind": "text", "text": "interleaved", "media_ref": None},
                          way_span(3), way_span(4)]),
        ("doc-00000005", [{"kind": "osm.relation", "media_ref": None,
                           "text": json.dumps({"id": 1, "tags": {"type": "myrelation"},
                                               "members": [
                               {"type": "node", "ref": 6, "role": "noderole"},
                               {"type": "way", "ref": 1, "role": "wayrole1"},
                               {"type": "way", "ref": 2, "role": "wayrole2"},
                           ]}, separators=(",", ":"))},
                          {"kind": "text", "text": "relation carrier", "media_ref": None}]),
    ]
    rows = []
    for doc_id, spans in docs:
        for pos, s in enumerate(spans):
            s["offset"] = pos
        rows.append({"doc_id": doc_id, "spans": spans})
    return spark.createDataFrame(pd.DataFrame(rows), schema=DOCUMENTS_SCHEMA)


DB_SNAPSHOT_EXPECTED_WKT = {
    1: "LINESTRING (-2 -1, -4 -3, -6 -5)",
    2: "LINESTRING (-4 -3, -6 -5, -8 -7)",
    3: "LINESTRING (-6 -5, -8 -7, -10 -9)",
    # way 4 dropped (single coord, WayBuilder.scala:95)
}

DB_SNAPSHOT_EXPECTED_RELATION_WKT = {
    # relation 1: node member filtered out; way members 1, 2 in member order
    1: "MULTILINESTRING ((-2 -1, -4 -3, -6 -5), (-4 -3, -6 -5, -8 -7))",
}


# ---------------------------------------------------------------------------
# Boundary polygons (FIXTURES.md section 4 — mirrors can.shp / canary.shp)
# ---------------------------------------------------------------------------

def gen_boundaries(spark: SparkSession, n: int = 20, seed: int = _SEED_DEFAULT) -> DataFrame:
    ids = np.arange(1, n + 1, dtype=np.uint64)
    cx = _u01(ids, seed * 4000 + 1) * 340.0 - 170.0
    cy = _u01(ids, seed * 4000 + 2) * 150.0 - 75.0
    r = 0.5 + _u01(ids, seed * 4000 + 3) * 4.0
    k = 5 + (_mix64(ids, seed * 4000 + 4) % np.uint64(6)).astype(np.int64)  # 5..10 vertices
    rot = _u01(ids, seed * 4000 + 5) * 2 * np.pi
    rows = []
    for i in range(n):
        ang = rot[i] + np.linspace(0, 2 * np.pi, int(k[i]), endpoint=False)
        xs = cx[i] + r[i] * np.cos(ang)
        ys = cy[i] + r[i] * 0.7 * np.sin(ang)
        pts = ", ".join(f"{x:.6f} {y:.6f}" for x, y in zip(xs, ys))
        first = f"{xs[0]:.6f} {ys[0]:.6f}"
        rows.append({"boundary_id": int(ids[i]), "name": f"island-{int(ids[i]):03d}",
                     "geometry_wkt": f"POLYGON (({pts}, {first}))"})
    return spark.createDataFrame(pd.DataFrame(rows))


# ---------------------------------------------------------------------------
# Pre-tagged ways (FIXTURES.md section 3 — mirrors ispra.txt)
# ---------------------------------------------------------------------------

def gen_ways_tagged(spark: SparkSession, n: int = 200, seed: int = _SEED_DEFAULT) -> DataFrame:
    ids = np.arange(1, n + 1, dtype=np.uint64)
    rows = []
    for i in range(n):
        w = ids[i]
        nv = 2 + int(_mix64(w, seed * 5000 + 1) % np.uint64(19))
        x0 = _u01(w, seed * 5000 + 2) * 20.0 - 10.0
        y0 = _u01(w, seed * 5000 + 3) * 16.0 - 8.0
        steps = np.arange(nv, dtype=np.uint64)
        dx = (_u01(w * np.uint64(131) + steps, seed * 5000 + 4) - 0.5) * 0.4
        dy = (_u01(w * np.uint64(131) + steps, seed * 5000 + 5) - 0.5) * 0.4
        xs = x0 + np.cumsum(dx)
        ys = y0 + np.cumsum(dy)
        hv = HIGHWAY_VALUES[int(_mix64(w, seed * 5000 + 6) % np.uint64(len(HIGHWAY_VALUES)))]
        pts = ", ".join(f"{x:.6f} {y:.6f}" for x, y in zip(xs, ys))
        rows.append({"way_id": int(w), "highway": hv,
                     "geometry_wkt": f"LINESTRING ({pts})"})
    return spark.createDataFrame(pd.DataFrame(rows))


# ---------------------------------------------------------------------------
# Raster strips (FIXTURES.md section 5 — mirrors littletiff.seq)
# ---------------------------------------------------------------------------

def gen_raster_tiles(spark: SparkSession, seed: int = _SEED_DEFAULT) -> DataFrame:
    strips = [
        # (origin_x, origin_y, psx, psy, w, h) — one aligned strip + one ragged
        (9.0, 46.0, 0.01, 0.01, 64, 64),
        (9.0, 45.36, 0.01, 0.01, 100, 37),
    ]
    rows = []
    for si, (ox, oy, psx, psy, w, h) in enumerate(strips):
        n = w * h
        vals = (_mix64(np.arange(n, dtype=np.uint64) + np.uint64(si * 1_000_000),
                       seed * 6000 + 1) % np.uint64(110)).astype(np.int32)
        rows.append({
            "origin_x": ox, "origin_y": oy,
            "pixel_size_x": psx, "pixel_size_y": psy,
            "width": w, "height": h, "proj": 4326,
            "pixels": vals.tolist(),
        })
    return spark.createDataFrame(pd.DataFrame(rows))
