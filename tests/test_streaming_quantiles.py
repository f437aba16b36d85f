"""Streaming quantile summaries (streaming/quantiles.py): multi-batch
fold replay, weight conservation, state bound, and rank-error of the
merged estimate."""

from __future__ import annotations

import hashlib
import random

import pyspark.sql.functions as F

K, SHARDS = 16, 2


def _h60_mod(s: str, m: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m


def test_streaming_quantiles_fold_and_error(spark, tmp_path):
    from osm_hadoop_spark.streaming.quantiles import (
        fold_compact,
        streaming_quantile_summary,
    )

    rng = random.Random(31)
    events = [(i, rng.randint(0, 10**6)) for i in range(1200)]
    df = spark.createDataFrame(events, "id long, value long")
    src = str(tmp_path / "src")
    cuts = [0, 400, 800, 1200]
    for b in range(3):
        df.filter(
            (F.col("id") >= cuts[b]) & (F.col("id") < cuts[b + 1])
        ).coalesce(1).write.parquet(f"{src}/{chr(97 + b)}")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = streaming_quantile_summary(stream, "value", "id", k=K, shards=SHARDS)
    q = (
        out.writeStream.format("memory").queryName("q_stream")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)

    final = {}
    for r in spark.sql("SELECT * FROM q_stream").collect():
        cur = final.setdefault(r["shard"], {"n": 0, "items": []})
        if r["n_shard"] > cur["n"]:
            cur["n"], cur["items"] = r["n_shard"], []
        if r["n_shard"] == cur["n"]:
            cur["items"].append((r["value"], r["id"], r["w"]))

    for shard in range(SHARDS):
        mine = [
            (v, i) for i, v in events if _h60_mod(str(i), SHARDS) == shard
        ]
        st = final[shard]
        # weight conservation + state bound
        assert st["n"] == len(mine)
        assert sum(w for _, _, w in st["items"]) == len(mine)
        assert len(st["items"]) <= K
        # exact replay: spark state == plain-Python fold of same batches
        items, ncomp = [], 0
        for b in range(3):
            fresh = [
                (v, i, 1)
                for i, v in events
                if cuts[b] <= i < cuts[b + 1]
                and _h60_mod(str(i), SHARDS) == shard
            ]
            items = sorted(items + fresh)
            items, ncomp = fold_compact(items, K, ncomp)
        assert sorted(st["items"]) == sorted(items)

    # merged estimate rank error at each decile: the incremental fold
    # compacts once per batch crossing of k, so its constant is looser
    # than the batch sketch's n/K — assert the 2n/K envelope
    merged = sorted(
        it for st in final.values() for it in st["items"]
    )
    n = sum(st["n"] for st in final.values())
    vals = sorted(v for _, v in events)
    slack = 2 * n // K + SHARDS
    for q_pct in range(10, 100, 10):
        tgt = (q_pct * n + 99) // 100
        cum = 0
        est = None
        for v, _, w in merged:
            cum += w
            if cum >= tgt:
                est = v
                break
        lo = sum(x < est for x in vals)
        hi = sum(x <= est for x in vals)
        assert lo <= tgt + slack and hi >= tgt - slack
