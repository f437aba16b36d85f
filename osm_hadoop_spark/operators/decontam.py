"""Benchmark decontamination — the eval-leak gate of an LLM data pipeline.

Before pretraining, every serious pipeline removes training documents
that share a long-enough word n-gram with a held-out evaluation
benchmark (the GPT-3 appendix / PaLM / Llama "13-gram decontamination"
step). The shape at 100 TB is fixed by the asymmetry of the two sides:
the benchmark is megabytes, the corpus is the 100 TB — so the benchmark
gram set must BROADCAST and the corpus side must stay a single scan
with a map-side-combinable per-doc count. No corpus-side shuffle exists
except the final slim (doc_id, n_hits) aggregate over join survivors.

Grams reuse the dedup family's distinct word-k-gram h60 shingles
(`dedup.shingles_col`), so contamination, MinHash, and Jaccard all
derive from one shared tokenization and one md5 per gram.

The benchmark membership is expressed as a SQL predicate over the same
table (a deterministic held-out subset) rather than a second input —
the sandbox has one corpus — but the operator keeps two separate scans
on purpose: the benchmark scan's predicate pushes into the parquet
reader, which is exactly the plan you want when the benchmark IS a
separate tiny table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.dedup import _spread, shingles_col


def decontaminate(
    documents: DataFrame,
    bench_pred: str,
    k: int = 4,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Flag training docs sharing any word k-gram with the benchmark.

    `bench_pred` is a SQL boolean selecting the benchmark documents;
    all other documents are the training corpus. Returns one row per
    CONTAMINATED training doc: (doc_id, n_hits) where n_hits counts
    the doc's distinct grams that occur anywhere in the benchmark.
    Clean docs produce no row (the output is the kill list).
    """
    nonempty = documents.filter(F.length(text) > 0)
    bench = (
        nonempty.filter(F.expr(bench_pred))
        .select(F.explode(shingles_col(k)).alias("gram"))
        .distinct()
    )
    train = _spread(nonempty.filter(~F.expr(bench_pred))).select(
        F.col(doc_id), F.explode(shingles_col(k)).alias("gram")
    )
    return (
        train.join(F.broadcast(bench), "gram")
        .groupBy(doc_id)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
