"""Mapbox Vector Tile (MVT v2.1) encoder — the tile-export sink.

The reference's export surface is rasterized tile images and Shapefiles
(ExtractShp.scala); the format a modern tile consumer actually ingests
is the MVT protobuf (spec 2.1, mapbox/vector-tile-spec). This sink
encodes per-tile feature groups into spec-compliant tile blobs as a
DISTRIBUTED operator: features group by tile key and each tile's bytes
are built inside an Arrow batch — no driver collect at all (unlike the
reference-parity Shapefile sink, which keeps the reference's bounded
driver-side write), so a planet's worth of tiles shards like any other
aggregation.

Wire format, hand-rolled on stdlib only (no protobuf dependency; the
layout below IS the spec, pinned by golden bytes + an independent
decoder in tests/test_mvt.py):
  Tile:    field 3 (bytes)  repeated Layer
  Layer:   field 15 varint  version = 2
           field 1  bytes   name
           field 2  bytes   repeated Feature
           field 3  bytes   repeated key (string table)
           field 4  bytes   repeated Value (value table)
           field 5  varint  extent (4096)
  Feature: field 1  varint  id
           field 2  bytes   packed tag indexes (key_i, value_i, ...)
           field 3  varint  geom type (1 POINT, 2 LINESTRING, 3 POLYGON)
           field 4  bytes   packed geometry commands
  Geometry commands: CommandInteger = (id & 0x7) | (count << 3) with
  id 1 MoveTo / 2 LineTo / 7 ClosePath; parameters are zigzag-encoded
  coordinate DELTAS, y-down tile-local integers (the caller clips/scales
  to the extent — operators/clip.py's Liang-Barsky output is the natural
  feed).

Determinism: features sort by (layer, fid) inside the tile, the key and
value tables are insertion-ordered by that same order, so a tile's bytes
are a pure function of its feature set — stable across partitionings,
which is what makes the golden-byte tests meaningful.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTENT = 4096

GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 1, 2, 3


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _field(tag: int, wire: int) -> bytes:
    return _varint((tag << 3) | wire)


def _len_field(tag: int, payload: bytes) -> bytes:
    return _field(tag, 2) + _varint(len(payload)) + payload


def _geometry(geom_type: int, xs: list[int], ys: list[int]) -> bytes:
    cmds: list[int] = []
    px = py = 0

    def move(i):
        nonlocal px, py
        cmds.append((1 & 0x7) | (1 << 3))
        cmds.append(_zigzag(xs[i] - px))
        cmds.append(_zigzag(ys[i] - py))
        px, py = xs[i], ys[i]

    n = len(xs)
    if geom_type == GEOM_POINT:
        move(0)
    else:
        move(0)
        k = n - 1 if geom_type == GEOM_LINESTRING else n - 2
        cmds.append((2 & 0x7) | (k << 3))
        last = n if geom_type == GEOM_LINESTRING else n - 1
        for i in range(1, last):
            cmds.append(_zigzag(xs[i] - px))
            cmds.append(_zigzag(ys[i] - py))
            px, py = xs[i], ys[i]
        if geom_type == GEOM_POLYGON:
            cmds.append((7 & 0x7) | (1 << 3))
    return b"".join(_varint(c) for c in cmds)


def _value_msg(v) -> bytes:
    if isinstance(v, str):
        enc = v.encode("utf-8")
        return _len_field(1, enc)
    return _field(4, 0) + _varint(_zigzag(int(v)) if int(v) < 0 else int(v))


def encode_tile_bytes(features: list[dict], layer_name: str = "layer") -> bytes:
    """features: [{fid, geom_type, xs, ys, tags: {k: v}}] -> tile bytes.
    Features are sorted by fid; key/value tables build in encounter
    order (deterministic given the sort)."""
    keys: dict[str, int] = {}
    values: dict[tuple, int] = {}
    feats = []
    for f in sorted(features, key=lambda f: f["fid"]):
        tag_idx: list[int] = []
        for k, v in (f.get("tags") or {}).items():
            if k not in keys:
                keys[k] = len(keys)
            vk = (type(v).__name__, v)
            if vk not in values:
                values[vk] = len(values)
            tag_idx += [keys[k], values[vk]]
        body = _field(1, 0) + _varint(int(f["fid"]))
        if tag_idx:
            packed = b"".join(_varint(t) for t in tag_idx)
            body += _len_field(2, packed)
        body += _field(3, 0) + _varint(f["geom_type"])
        body += _len_field(4, _geometry(f["geom_type"], list(f["xs"]), list(f["ys"])))
        feats.append(_len_field(2, body))
    layer = _field(15, 0) + _varint(2)
    layer += _len_field(1, layer_name.encode("utf-8"))
    layer += b"".join(feats)
    for k in keys:
        layer += _len_field(3, k.encode("utf-8"))
    for (_, v) in values:
        layer += _len_field(4, _value_msg(v))
    layer += _field(5, 0) + _varint(EXTENT)
    return _len_field(3, layer)


def mvt_encode(features: DataFrame, layer_name: str = "layer") -> DataFrame:
    """Distributed MVT sink: features(tz, tx, ty, fid, geom_type, xs, ys,
    attr) -> one row per tile (tz, tx, ty, n_features, mvt binary).

    groupBy tile key -> applyInPandas builds each tile's blob from its
    own rows (Arrow batch in, binary out). The single shuffle is the
    tile partitioning a tile sink needs anyway; blob size is bounded by
    the upstream clip (a tile only holds tile-local geometry).
    """
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        tz, tx, ty = (int(pdf[c].iloc[0]) for c in ("tz", "tx", "ty"))
        feats = [
            {
                "fid": int(r.fid),
                "geom_type": int(r.geom_type),
                "xs": list(r.xs),
                "ys": list(r.ys),
                "tags": {"name": r.attr} if r.attr is not None else {},
            }
            for r in pdf.itertuples()
        ]
        blob = encode_tile_bytes(feats, layer_name)
        return pd.DataFrame(
            {"tz": [tz], "tx": [tx], "ty": [ty],
             "n_features": [len(feats)], "mvt": [blob]}
        )

    return features.groupBy("tz", "tx", "ty").applyInPandas(
        build, "tz bigint, tx bigint, ty bigint, n_features bigint, mvt binary"
    )
