"""Streaming heavy hitters (streaming/heavy.py): after multi-batch
evolution the per-shard Misra-Gries invariants hold against exact
counts, and the summary equals a plain-Python fold of the same batches."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

K, SHARDS = 4, 2


def _h60_mod(s: str, m: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m


def _events():
    # skewed zipf-ish stream: a few heavy keys + a long tail,
    # interleaved so every micro-batch touches both
    rows = []
    i = 0
    for rep, keys in (
        (60, ["alpha"]), (40, ["beta"]), (25, ["gamma"]), (15, ["delta"]),
        (3, [f"tail{j}" for j in range(30)]),
    ):
        for key in keys:
            for _ in range(rep):
                rows.append((i, key))
                i += 1
    rows.sort(key=lambda r: (r[0] * 2654435761) % 1000003)  # shuffle
    return [(j, k) for j, (_, k) in enumerate(rows)]


def _mg_fold(batches, k):
    counters, n, d = {}, 0, 0
    for batch in batches:
        vc = {}
        for key in batch:
            vc[key] = vc.get(key, 0) + 1
        for key in sorted(vc):
            n += vc[key]
            counters[key] = counters.get(key, 0) + vc[key]
        if len(counters) > k:
            ranked = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
            dec = ranked[k][1]
            d += dec
            counters = {kk: c - dec for kk, c in ranked[:k] if c > dec}
    return counters, n, d


def test_streaming_mg_invariants_and_fold(spark, tmp_path):
    from osm_hadoop_spark.streaming.heavy import streaming_heavy_hitters

    events = _events()
    df = spark.createDataFrame(events, "order_col long, key string")
    src = str(tmp_path / "src")
    n_total = len(events)
    cuts = [0, n_total // 3, 2 * n_total // 3, n_total]
    for b in range(3):
        df.filter(
            (F.col("order_col") >= cuts[b]) & (F.col("order_col") < cuts[b + 1])
        ).coalesce(1).write.parquet(f"{src}/{chr(97 + b)}")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = streaming_heavy_hitters(stream, "key", k=K, shards=SHARDS)
    q = (
        out.writeStream.format("memory").queryName("hh_stream")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    # update mode: keep the LAST summary per shard (max n_shard)
    final = {}
    for r in spark.sql("SELECT * FROM hh_stream").collect():
        cur = final.setdefault(r["shard"], {"n": 0, "d": 0, "est": {}})
        if r["n_shard"] >= cur["n"]:
            if r["n_shard"] > cur["n"]:
                cur["est"] = {}
            cur["n"], cur["d"] = r["n_shard"], r["d_shard"]
            cur["est"][r["key"]] = r["est"]

    true = {}
    for _, key in events:
        true[key] = true.get(key, 0) + 1

    for shard in range(SHARDS):
        keys = [k for k in true if _h60_mod(k, SHARDS) == shard]
        n_shard = sum(true[k] for k in keys)
        st = final[shard]
        assert st["n"] == n_shard
        # MG invariant 1: total decrement mass bounded
        assert st["d"] <= n_shard // (K + 1)
        for k in keys:
            est = st["est"].get(k, 0)
            # invariant 2: underestimate, within d_shard
            assert est <= true[k] <= est + st["d"]
            # invariant 3: every key heavier than d_shard is tracked
            if true[k] > st["d"]:
                assert k in st["est"], (shard, k, true[k], st["d"])
        # exact replay: spark state == plain-Python fold of same batches
        batches = [
            [key for j, key in events
             if cuts[b] <= j < cuts[b + 1] and _h60_mod(key, SHARDS) == shard]
            for b in range(3)
        ]
        counters, n, d = _mg_fold(batches, K)
        assert st["est"] == counters and (st["n"], st["d"]) == (n, d)
