"""MVT sink (sources/mvt.py): independent wire-format decoder round-trip,
golden bytes, and partitioning invariance of the distributed encoder."""

from pyspark.sql import Row

from osm_hadoop_spark.sources.mvt import encode_tile_bytes, mvt_encode


# --- minimal independent decoder (test oracle only) -------------------------

def _rd_varint(b, i):
    n = s = 0
    while True:
        x = b[i]
        i += 1
        n |= (x & 0x7F) << s
        if not x & 0x80:
            return n, i
        s += 7


def _unzig(n):
    return (n >> 1) ^ -(n & 1)


def _fields(b):
    i = 0
    while i < len(b):
        key, i = _rd_varint(b, i)
        tag, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _rd_varint(b, i)
        elif wire == 2:
            ln, i = _rd_varint(b, i)
            v = b[i:i + ln]
            i += ln
        else:
            raise AssertionError(f"wire {wire}")
        yield tag, wire, v


def decode_tile(b):
    layers = []
    for tag, _, v in _fields(b):
        assert tag == 3
        layer = {"features": [], "keys": [], "values": []}
        for t2, _, v2 in _fields(v):
            if t2 == 15:
                layer["version"] = v2
            elif t2 == 1:
                layer["name"] = v2.decode()
            elif t2 == 5:
                layer["extent"] = v2
            elif t2 == 3:
                layer["keys"].append(v2.decode())
            elif t2 == 4:
                for t3, w3, v3 in _fields(v2):
                    layer["values"].append(
                        v3.decode() if t3 == 1 else v3
                    )
            elif t2 == 2:
                f = {"tags": []}
                for t3, _, v3 in _fields(v2):
                    if t3 == 1:
                        f["fid"] = v3
                    elif t3 == 3:
                        f["type"] = v3
                    elif t3 == 2:
                        i = 0
                        while i < len(v3):
                            n, i = _rd_varint(v3, i)
                            f["tags"].append(n)
                    elif t3 == 4:
                        cmds, i = [], 0
                        while i < len(v3):
                            n, i = _rd_varint(v3, i)
                            cmds.append(n)
                        f["geom"] = cmds
                layer["features"].append(f)
        layers.append(layer)
    return layers


def _decode_coords(cmds):
    pts, i, x, y = [], 0, 0, 0
    closed = False
    while i < len(cmds):
        cid, cnt = cmds[i] & 7, cmds[i] >> 3
        i += 1
        if cid in (1, 2):
            for _ in range(cnt):
                x += _unzig(cmds[i]); y += _unzig(cmds[i + 1]); i += 2
                pts.append((x, y))
        elif cid == 7:
            closed = True
    return pts, closed


def test_roundtrip_all_geometry_types():
    feats = [
        {"fid": 1, "geom_type": 1, "xs": [100], "ys": [200], "tags": {"name": "pt"}},
        {"fid": 2, "geom_type": 2, "xs": [0, 10, 10], "ys": [0, 0, 5],
         "tags": {"name": "ln"}},
        {"fid": 3, "geom_type": 3, "xs": [0, 8, 8, 0], "ys": [0, 0, 8, 0],
         "tags": {"name": "pg"}},
    ]
    layers = decode_tile(encode_tile_bytes(feats, "roads"))
    assert len(layers) == 1
    lay = layers[0]
    assert lay["version"] == 2 and lay["extent"] == 4096 and lay["name"] == "roads"
    assert lay["keys"] == ["name"] and lay["values"] == ["pt", "ln", "pg"]
    f1, f2, f3 = lay["features"]
    assert (f1["fid"], f1["type"]) == (1, 1)
    assert _decode_coords(f1["geom"]) == ([(100, 200)], False)
    assert _decode_coords(f2["geom"]) == ([(0, 0), (10, 0), (10, 5)], False)
    # polygon: last (closing) vertex elided, ClosePath set
    pts, closed = _decode_coords(f3["geom"])
    assert pts == [(0, 0), (8, 0), (8, 8)] and closed
    assert f2["tags"] == [0, 1]  # key 'name', value index 1


def test_golden_bytes_stable():
    feats = [{"fid": 7, "geom_type": 2, "xs": [1, 4], "ys": [2, 2],
              "tags": {"name": "a"}}]
    assert encode_tile_bytes(feats).hex() == (
        "1a2978020a056c617965721210080712020000180222060902040a0600"
        "1a046e616d6522030a0161288020"
    )


def test_negative_deltas_zigzag():
    feats = [{"fid": 1, "geom_type": 2, "xs": [10, 3], "ys": [10, 20],
              "tags": {}}]
    f = decode_tile(encode_tile_bytes(feats))[0]["features"][0]
    assert _decode_coords(f["geom"])[0] == [(10, 10), (3, 20)]


def test_distributed_encoder_partition_invariant(spark):
    rows = [
        Row(tz=7, tx=1, ty=2, fid=i, geom_type=2,
            xs=[i, i + 5], ys=[0, 9], attr=f"w{i}")
        for i in range(20)
    ] + [Row(tz=7, tx=9, ty=9, fid=99, geom_type=1, xs=[4], ys=[4], attr=None)]
    df = spark.createDataFrame(rows)
    a = {(r["tz"], r["tx"], r["ty"]): (r["n_features"], bytes(r["mvt"]))
         for r in mvt_encode(df).collect()}
    b = {(r["tz"], r["tx"], r["ty"]): (r["n_features"], bytes(r["mvt"]))
         for r in mvt_encode(df.repartition(13)).collect()}
    assert a == b
    assert a[(7, 1, 2)][0] == 20 and a[(7, 9, 9)][0] == 1
    lay = decode_tile(a[(7, 1, 2)][1])[0]
    assert len(lay["features"]) == 20
    assert [f["fid"] for f in lay["features"]] == list(range(20))
