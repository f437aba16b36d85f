"""Streaming CUSUM (streaming/cusum.py): multi-batch state evolution
equals the plain-Python Page fold over the same ordered series."""

from __future__ import annotations

import pyspark.sql.functions as F

TARGET, SLACK, H = 100, 5, 60


def _fold(xs):
    n = sp = sn = alarms = 0
    first = None
    for x in xs:
        n += 1
        sp = max(0, sp + (x - TARGET - SLACK))
        sn = max(0, sn + (TARGET - x - SLACK))
        if sp > H or sn > H:
            alarms += 1
            if first is None:
                first = n
            sp = sn = 0
    return (n, sp, sn, alarms, first)


def _series(u):
    # user 0: stable around target (no alarm); user 1: upward drift;
    # user 2: one downward spike burst then recovery
    if u == 0:
        return [100, 102, 98, 101, 99, 100, 97, 103] * 3
    if u == 1:
        return [100, 105, 112, 118, 126, 133, 141, 150, 160, 171]
    return [100, 100, 20, 15, 100, 100, 100, 100]


def test_streaming_cusum_multibatch_equals_fold(spark, tmp_path):
    from osm_hadoop_spark.streaming.cusum import streaming_cusum

    rows = []
    for u in range(3):
        for i, x in enumerate(_series(u)):
            rows.append((u, x, i))
    df = spark.createDataFrame(rows, "user_id long, value_cents long, order_col long")
    src = str(tmp_path / "src")
    # three files = three micro-batches, split by order ranges so the
    # cross-batch fold order matches order_col
    for lo, hi, part in ((0, 3, "a"), (3, 8, "b"), (8, 99, "c")):
        df.filter((F.col("order_col") >= lo) & (F.col("order_col") < hi)) \
          .coalesce(1).write.parquet(f"{src}/{part}")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = streaming_cusum(stream, TARGET, SLACK, H)
    q = (
        out.writeStream.format("memory").queryName("cusum_stream")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    # update mode: last row per key is the final state
    got = {
        r["user_id"]: (r["n_seen"], r["s_pos"], r["s_neg"],
                       r["n_alarms"], r["first_alarm_n"])
        for r in spark.sql(
            "SELECT * FROM cusum_stream ORDER BY n_seen"
        ).collect()
    }
    want = {u: _fold(_series(u)) for u in range(3)}
    assert got == want
    assert want[0][3] == 0          # stable user never alarms
    assert want[1][3] >= 1          # drift alarms
    assert want[2][3] >= 1 and want[2][4] is not None
