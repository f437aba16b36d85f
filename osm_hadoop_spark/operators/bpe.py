"""BPE merge application — the tokenizer-apply step of an LLM pipeline.

Training-data pipelines don't just count whitespace tokens; they apply a
byte-pair-encoding merge table (Sennrich et al. 2016). This operator
applies a FIXED, ordered merge list to character streams exactly the way
reference BPE implementations do: merge rank by merge rank, each rank in
one greedy left-to-right non-overlapping pass.

The per-rank pass is a LEFT FOLD, not a window or join:

    step(acc, x) = acc[:-1] ++ [a+b]   if acc ends with `a` and x == `b`
                   acc ++ [x]          otherwise

Greedy non-overlap falls out of the fold shape ("aaa" under (a,a) gives
[aa, a]); a merged token can never re-trigger the same rank because
a+b != a (b non-empty). Chained merges (a later rank consuming an
earlier rank's output) are exercised by the driver merge table and
pinned in tests.

Engine mapping: Spark `aggregate()` with an explicit empty-array zero;
DuckDB `list_reduce()` — which has NO zero and seeds with the first
element, so elements are wrapped as 1-element lists per rank
(list_transform(.., x -> [x])) making the seed the correct base case.
Both folds render from the same Python loop over the merge table, the
exprdsl discipline applied to sequential string kernels. Per-document
work is O(rounds * len^2) on short prefixes — all JVM / native, no
Python, no shuffle beyond the dedup _spread exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


def spark_fold_sql(merges: list[tuple[str, str]], chars_expr: str) -> str:
    """Nested Spark-SQL aggregate() folds applying `merges` in order."""
    expr = chars_expr
    for a, b in merges:
        m = a + b
        expr = (
            f"aggregate({expr}, CAST(array() AS ARRAY<STRING>), "
            f"(acc, x) -> CASE WHEN size(acc) > 0 "
            f"AND element_at(acc, -1) = '{a}' AND x = '{b}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), array('{m}')) "
            f"ELSE concat(acc, array(x)) END)"
        )
    return expr


def duckdb_fold_sql(merges: list[tuple[str, str]], chars_expr: str) -> str:
    """The same fold ladder rendered for DuckDB list_reduce()."""
    expr = chars_expr
    for a, b in merges:
        m = a + b
        expr = (
            f"list_reduce(list_transform({expr}, x -> [x]), "
            f"(acc, xs) -> CASE WHEN len(acc) > 0 "
            f"AND acc[-1] = '{a}' AND xs[1] = '{b}' "
            f"THEN list_append(list_slice(acc, 1, len(acc) - 1), '{m}') "
            f"ELSE list_concat(acc, xs) END)"
        )
    return expr


def pair_counts(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    prefix_len: int = 40,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Adjacent-pair census of the corpus AFTER applying `merges`.

    The training inner loop: tokenize with the fold ladder, emit every
    adjacent token pair, ONE partial-aggregating hash count. The fold is
    bound exactly once per row (array-wrap + flatten — projection
    collapse would otherwise re-run the ladder per field read), and the
    count is map-side combinable, so at 100 TB each round is one scan +
    one slim (pa, pb, n) shuffle. Returns (pa, pb, n_pairs).
    """
    from osm_hadoop_spark.operators.dedup import _spread

    folded = spark_fold_sql(merges, "split(_t, '')")
    d = _spread(documents.filter(F.length(text) > 0)).select(
        F.expr(f"substr({text}, 1, {prefix_len})").alias("_t")
    )
    return (
        d.select(
            F.expr(
                f"explode(flatten(transform(array({folded}), t -> "
                f"transform(slice(t, 1, size(t) - 1), (x, i) -> "
                f"struct(x AS pa, element_at(t, i + 2) AS pb))))) AS p"
            )
        )
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def bpe_train(
    documents: DataFrame,
    rounds: int = 8,
    prefix_len: int = 40,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Learn an ordered BPE merge table from the corpus (Sennrich et al.
    2016 training): `rounds` iterations of census -> argmax -> append.

    Ties break (max n_pairs, then min pa, then min pb) — a total order,
    so training is deterministic. Per round the driver receives exactly
    ONE row (the argmax via TakeOrdered, never a full sort) — the same
    bounded parameter-collect posture as the IVF centroid fit. Round k
    re-tokenizes from raw characters through a depth-k ladder (O(K^2)
    character work total); at 100 TB you would checkpoint the token
    stream per round instead, but recount-from-source keeps every round
    a pure one-scan stateless job, which is how distributed BPE trainers
    actually ship (delta counting is a single-machine optimization that
    needs mutable state).

    Returns the learned table: (merge_rank, pa, pb, n_pairs). Stops
    early if no pair remains (every doc a single token).
    """
    learned: list[tuple[str, str]] = []
    rows = []
    for k in range(rounds):
        top = (
            pair_counts(documents, learned, prefix_len, doc_id, text)
            .orderBy(F.desc("n_pairs"), F.asc("pa"), F.asc("pb"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        rows.append((k, r["pa"], r["pb"], r["n_pairs"]))
        learned.append((r["pa"], r["pb"]))
    return documents.sparkSession.createDataFrame(
        rows, "merge_rank bigint, pa string, pb string, n_pairs bigint"
    )


def bpe_apply(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    prefix_len: int = 40,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Apply the ordered BPE `merges` to the first `prefix_len` chars.

    Returns (doc_id, n_tokens, toks): final token count and the full
    token sequence joined with '|' (callers guarantee tokens never
    contain '|'; the driver corpus is words + spaces). Empty documents
    are dropped.
    """
    from osm_hadoop_spark.operators.dedup import _spread

    d = _spread(documents.filter(F.length(text) > 0)).select(
        doc_id, F.expr(f"substr({text}, 1, {prefix_len})").alias("_t")
    )
    folded = spark_fold_sql(merges, "split(_t, '')")
    # bind the fold result ONCE (transform-over-1-element-array, the
    # cdc_chunks lesson): naming it and reading two fields would let
    # projection collapse re-inline — and re-run — the whole fold ladder
    return d.select(
        doc_id,
        F.expr(
            f"inline(transform(array({folded}), t -> struct("
            f"CAST(size(t) AS BIGINT) AS n_tokens, "
            f"array_join(t, '|') AS toks)))"
        ),
    )
