"""Modality-interleaving stats (operators/span_stats.py): RLE edge cases,
transition-matrix row sums, and the zero-shuffle plan shape."""

import pyspark.sql.functions as F


def _docs(spark, kind_lists):
    rows = [
        (
            f"d{i}",
            [(k, None, None, j) for j, k in enumerate(kinds)],
        )
        for i, kinds in enumerate(kind_lists)
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_rle_edge_cases(spark):
    from osm_hadoop_spark.operators.span_stats import kind_runs

    docs = _docs(
        spark,
        [
            ["text"],                               # single span
            ["text", "text", "text"],               # one run
            ["text", "media", "text", "media"],     # fully alternating
            ["media", "media", "text", "text", "text"],  # two runs
        ],
    )
    got = {r["doc_id"]: r for r in kind_runs(docs).collect()}
    assert (got["d0"]["n_runs"], got["d0"]["max_run"], got["d0"]["runs_rle"]) == (
        1, 1, "text:1",
    )
    assert (got["d1"]["n_runs"], got["d1"]["max_run"], got["d1"]["runs_rle"]) == (
        1, 3, "text:3",
    )
    assert (got["d2"]["n_runs"], got["d2"]["max_run"]) == (4, 1)
    assert got["d3"]["runs_rle"] == "media:2|text:3"
    assert got["d3"]["n_spans"] == 5


def test_transition_row_sums_equal_doc_count(spark):
    from osm_hadoop_spark.operators.span_stats import kind_transitions

    kind_lists = [["text", "media"], ["media"], ["text", "text", "osm.node"]]
    t = kind_transitions(_docs(spark, kind_lists)).collect()
    counts = {(r["kind_from"], r["kind_to"]): r["n_transitions"] for r in t}
    n_docs = len(kind_lists)
    # every doc contributes exactly one '^' start and one '$' end
    assert sum(v for (kf, _), v in counts.items() if kf == "^") == n_docs
    assert sum(v for (_, kt), v in counts.items() if kt == "$") == n_docs
    assert counts[("text", "media")] == 1
    assert counts[("text", "text")] == 1
    # total transitions = sum over docs of (n_spans + 1)
    assert sum(counts.values()) == sum(len(k) + 1 for k in kind_lists)


def test_rle_plan_has_no_exchange(spark):
    """The RLE derivation must stay in one codegen projection: no shuffle,
    no explode — the spans array never leaves its row."""
    from osm_hadoop_spark.operators.span_stats import kind_runs

    docs = _docs(spark, [["text", "media"]])
    plan = kind_runs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode


def test_media_density_counts(spark):
    from osm_hadoop_spark.operators.span_stats import media_density

    docs = _docs(spark, [["text", "media", "media"], ["text"]])
    got = {r["doc_id"]: (r["n_media"], r["n_spans"])
           for r in media_density(docs).collect()}
    assert got == {"d0": (2, 3), "d1": (0, 1)}


def test_streaming_transitions_match_batch(spark, tmp_path):
    """§2.7 twin: windowed streaming transition counts, summed over
    windows, equal the batch matrix on the same documents."""
    from osm_hadoop_spark.operators.span_stats import kind_transitions
    from osm_hadoop_spark.sources.fixtures import gen_documents
    from osm_hadoop_spark.streaming.spans import streaming_transition_counts

    docs = gen_documents(spark, 200, seed=9).withColumn(
        "ingest_ts",
        F.timestamp_seconds(F.lit(1700000000) + (F.crc32("doc_id") % 120)),
    )
    src = str(tmp_path / "span_stream_src")
    docs.write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = streaming_transition_counts(stream, window="1 minute",
                                      watermark="5 minutes")
    q = (
        out.writeStream.format("memory").queryName("span_transitions_stream")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["kind_from"], r["kind_to"]): r["n"]
        for r in spark.sql(
            "SELECT kind_from, kind_to, CAST(sum(n_transitions) AS BIGINT) n "
            "FROM span_transitions_stream GROUP BY 1, 2"
        ).collect()
    }
    batch = {
        (r["kind_from"], r["kind_to"]): r["n_transitions"]
        for r in kind_transitions(spark.read.parquet(src)).collect()
    }
    assert got == batch and len(batch) > 2
