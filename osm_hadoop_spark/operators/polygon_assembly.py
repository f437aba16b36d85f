"""Multipolygon assembly from relation member rings (north-star addition).

Completes the relation-assembly story (operators/relation_assembly.py): OSM
multipolygon relations carry `outer` / `inner` member ways — closed rings or
open fragments — that must be chained into rings, orientation-normalized,
and holes assigned to their containing outer ring. The reference never gets
here (its dispatch drops relations, NodeJoiner.scala:110,136); the north
rule's "way/relation assembly" and "point-in-polygon containment" both need
assembled polygons, so this is the construction side of E8.

Distributed shape: ONE bounded groupBy-shuffle on rel_id, then a pure-NumPy
`applyInPandas` per relation — the documented exception case where built-in
operators can't express the semantics (endpoint chaining is inherently
sequential *within* a relation, and relations are small: OSM caps member
lists, so groups are O(tens)). No driver collect, no cross-relation state.

Deterministic contract (mirrored by the driver's DuckDB oracle):
  - members sorted within the relation before chaining (first vertex, role);
  - canonical rings (functions/rings.py): outer CCW, holes CW, lex-min start;
  - duplicate ring bodies deduplicated per relation;
  - each hole assigned to the containing outer ring minimizing
    (|area2|, body-string); holes with no container are dropped (counted);
  - polygon bodies '((outer), (hole)...)' with holes body-sorted; the
    MULTIPOLYGON lists polygon bodies body-sorted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_OUT_SCHEMA = (
    "rel_id bigint, n_polys int, n_holes int, n_dropped int, "
    "area2 bigint, geometry_wkt string"
)


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from osm_hadoop_spark.functions.rings import (
        canonical_ring,
        chain_segments,
        ring_body,
    )
    from osm_hadoop_spark.functions.spatial import point_in_polygon_pairs

    rel_id = int(pdf["rel_id"].iloc[0])
    # deterministic member order regardless of shuffle arrival
    pdf = pdf.assign(
        _x0=[float(x[0]) for x in pdf["xs"]],
        _y0=[float(y[0]) for y in pdf["ys"]],
        _n=[len(x) for x in pdf["xs"]],
    ).sort_values(["role", "_x0", "_y0", "_n"], kind="stable")

    chained: dict[str, tuple[list, int]] = {}
    for role in ("outer", "inner"):
        segs = [
            (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
            for x, y, r in zip(pdf["xs"], pdf["ys"], pdf["role"])
            if r == role
        ]
        chained[role] = chain_segments(segs)

    outers: dict[str, tuple[np.ndarray, np.ndarray, float]] = {}
    for xs, ys in chained["outer"][0]:
        cx, cy, a2 = canonical_ring(xs, ys, ccw=True)
        outers.setdefault(ring_body(cx, cy), (cx, cy, a2))
    holes: dict[str, tuple[np.ndarray, np.ndarray, float]] = {}
    for xs, ys in chained["inner"][0]:
        cx, cy, a2 = canonical_ring(xs, ys, ccw=False)
        holes.setdefault(ring_body(cx, cy), (cx, cy, a2))

    n_dropped = chained["outer"][1] + chained["inner"][1]
    if not outers:
        return pd.DataFrame(
            [
                {
                    "rel_id": rel_id,
                    "n_polys": 0,
                    "n_holes": 0,
                    "n_dropped": n_dropped + len(holes),
                    "area2": 0,
                    "geometry_wkt": None,
                }
            ]
        )

    obodies = sorted(outers)  # body-string order = polygon order
    # hole -> owner: containing outer minimizing (|area2|, body)
    cand_order = sorted(obodies, key=lambda b: (outers[b][2], b))
    flat_x = [outers[b][0] for b in cand_order]
    flat_y = [outers[b][1] for b in cand_order]
    counts = np.array([len(x) for x in flat_x], dtype=np.int64)
    pxs = np.concatenate(flat_x) if flat_x else np.zeros(0)
    pys = np.concatenate(flat_y) if flat_y else np.zeros(0)

    assigned: dict[str, list[str]] = {b: [] for b in obodies}
    hole_area: dict[str, float] = {b: 0.0 for b in obodies}
    n_holes = 0
    for hb in sorted(holes):
        hx, hy, ha2 = holes[hb]
        inside = point_in_polygon_pairs(
            np.full(len(cand_order), hx[0]),
            np.full(len(cand_order), hy[0]),
            pxs,
            pys,
            counts,
        )
        hit = np.flatnonzero(inside)
        if hit.size == 0:
            n_dropped += 1
            continue
        owner = cand_order[int(hit[0])]
        assigned[owner].append(hb)
        hole_area[owner] += ha2
        n_holes += 1

    bodies = []
    area2 = 0.0
    for b in obodies:
        hs = assigned[b]
        bodies.append("(" + ", ".join([b] + hs) + ")")
        area2 += outers[b][2] - hole_area[b]
    return pd.DataFrame(
        [
            {
                "rel_id": rel_id,
                "n_polys": len(obodies),
                "n_holes": n_holes,
                "n_dropped": n_dropped,
                "area2": int(round(area2)),
                "geometry_wkt": "MULTIPOLYGON (" + ", ".join(bodies) + ")",
            }
        ]
    )


def assemble_multipolygons(members: DataFrame) -> DataFrame:
    """members(rel_id, role in {'outer','inner'}, xs, ys) -> one row per
    relation: (rel_id, n_polys, n_holes, n_dropped, area2, geometry_wkt).

    area2 = 2 * total polygon area (outer minus assigned holes) — exact on
    lattice coordinates, hence the bigint (the driver oracle recomputes it
    arithmetically)."""
    return members.groupBy("rel_id").applyInPandas(
        lambda pdf: _assemble_group(pdf), schema=_OUT_SCHEMA
    )
