import pytest

from osm_hadoop_spark.operators.curation import chunk_documents


def _brute_chunks(text, n, overlap):
    toks = text.split()
    stride = n - overlap
    out = []
    for ci, s in enumerate(range(0, len(toks), stride)):
        w = toks[s:s + n]
        out.append((ci, len(w), " ".join(w)))
    return out


CASES = [
    ("a b c d e f g h i", 4, 2),   # last window short
    ("a b c d", 4, 2),             # one stride step past exact fit
    ("a b c d e f", 3, 0),         # no overlap, exact multiple
    ("  spaced\t out \n tokens here  ", 2, 1),  # messy whitespace
    ("solo", 5, 2),                # fewer tokens than a chunk
    ("", 4, 1),                    # empty -> zero chunks
    ("   ", 4, 1),                 # whitespace-only -> zero chunks
]


def test_chunking_matches_brute_force(spark):
    rows = [(str(i), t) for i, (t, _, _) in enumerate(CASES)]
    for i, (text, n, ov) in enumerate(CASES):
        df = spark.createDataFrame([(str(i), text)], "doc_id: string, text: string")
        got = [
            (r["chunk_id"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(df, chunk_tokens=n, overlap=ov)
            .orderBy("chunk_id").collect()
        ]
        assert got == _brute_chunks(text, n, ov), (text, n, ov)


def test_chunking_overlap_reconstructs_document(spark):
    # dropping each chunk's first `overlap` tokens (except chunk 0)
    # reconstructs the normalized document exactly — no token lost or
    # duplicated
    text = " ".join(f"t{i}" for i in range(101))
    df = spark.createDataFrame([("d", text)], "doc_id: string, text: string")
    rows = chunk_documents(df, chunk_tokens=16, overlap=4).orderBy("chunk_id").collect()
    rebuilt = []
    for r in rows:
        toks = r["chunk_text"].split()
        rebuilt.extend(toks if r["chunk_id"] == 0 else toks[4:])
    assert " ".join(rebuilt) == text


def test_chunking_plan_is_single_stage(spark):
    df = spark.createDataFrame([("d", "a b c")], "doc_id: string, text: string")
    plan = (
        chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_chunking_rejects_bad_params(spark):
    df = spark.createDataFrame([("d", "a")], "doc_id: string, text: string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunking_is_streaming_safe(spark, tmp_path):
    # the operator is a pure projection + explode (no agg, no sort), so
    # it must run unchanged on a stream in append mode and match batch
    docs = [(f"d{i}", " ".join(f"w{i}_{j}" for j in range(i * 3))) for i in range(8)]
    schema = "doc_id string, text string"
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(docs, schema).coalesce(1).write.parquet(src)

    got = []
    q = (
        chunk_documents(spark.readStream.schema(schema).parquet(src),
                        chunk_tokens=5, overlap=2)
        .writeStream.foreachBatch(lambda df, _b: got.extend(df.collect()))
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    want = chunk_documents(
        spark.createDataFrame(docs, schema), chunk_tokens=5, overlap=2
    ).collect()
    key = lambda r: (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
