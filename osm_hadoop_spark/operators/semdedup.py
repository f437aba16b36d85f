"""SemDeDup: semantic (embedding-cluster) deduplication, integer-exact.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication") prune web corpora by k-means-clustering
document embeddings and removing, within each cluster, documents whose
cosine similarity to another cluster member exceeds a threshold — the
clusters bound the candidate set so the quadratic pairwise step never
touches the full corpus. The reference engine has no embedding surface
at all; this operator extends the repo's dedup family (exact / MinHash /
SimHash / sorted-neighborhood, operators/dedup.py) with the
embedding-space member the published LLM-data pipelines actually run.

Semantics (deterministic — a pure function of the input set):
  - embeddings are fixed-point quantized iv_d = floor(x_d * scale)
    (PQ_SCALE precedent in operators/similarity.py: a power-of-two-free
    integer grid where every downstream comparison is int64 arithmetic);
  - each vector joins the cluster of its nearest centroid by INTEGER
    squared L2 (ties -> lowest centroid index), centroids being literals
    fitted once on a bounded hash-ordered sample (IVF/PQ precedent);
  - within a cluster, a pair (a, b) with a.vec_id < b.vec_id is a
    duplicate witness for b iff cos(a, b) >= tau, decided WITHOUT floats
    by cross-multiplication on the quantized grid:
        dot(a,b) > 0  AND  dot^2 * den^2 >= num^2 * |a|^2 * |b|^2
    (tau = num/den; the dot > 0 guard stops anti-parallel vectors from
    passing the squared test);
  - b is pruned iff any witness exists; dup_of = the MINIMUM witness id
    (so the kept set is exactly the ids with no smaller tau-neighbor in
    their cluster — SemDeDup's "keep one representative" rule made
    visit-order-free).

Exactness: after quantization every quantity above is a bigint.
Overflow bound: |iv_d| <= scale * max|x|; with scale=1024, dim=64,
max|x| <= 1 the worst dot is < 2^26, so dot^2 * den^2 < 2^52 * den^2 —
safe for den <= 1024. The quantization itself (float32 -> float64 widen,
one double multiply, floor) is bit-identical across engines.

100 TB posture:
  - cluster assignment is a literal-ladder projection (k aggregate
    expressions per row, whole-stage codegen, NO shuffle) — the same
    shape as kmeans_lloyd's assignment stage;
  - the pairwise step is an equi-self-join on the cluster key: the only
    shuffle is hash-partitioning the corpus by cluster, and the cost is
    sum_k c_k^2 — SemDeDup's own published cost model, bounded by
    choosing k proportional to n (the paper uses n/k ~ 10^4..10^5);
  - the known hot spot is a skewed cluster (c_k^2 blowup). The
    `neighborhood` guard switches big clusters to linear
    sorted-neighborhood candidates (Hernandez-Stolfo, the
    dedup_sorted_neighborhood precedent): members sort by their INTEGER
    dot with their own centroid (near-duplicates have near-equal
    projections) and only lead()-window pairs are tested — exactly
    (w-1) * c_k candidates, recall traded for a hard bound, amplified in
    practice by multi-pass over different projections;
  - no cross product anywhere; nothing leaves the JVM.

Reference parity bookkeeping: candidate blocking = the computable-key
equi-join discipline of the tile family (functions/tiles.py, J5); the
centroid fit mirrors operators/similarity.py ivf_fit_centroids
(NodeJoiner.scala:67-68-style bounded sample collect).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.similarity import (
    IVF_SAMPLE_MOD,
    IVF_SAMPLE_MULT,
    _kmeans_l2_int,
)

SEM_SCALE = 1024


def _quant(col, scale: int):
    return F.transform(
        F.col(col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(scale))).cast("long"),
    )


def _int_dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def semdedup_fit_centroids(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 4,
    sample: int = 4096,
    scale: int = SEM_SCALE,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> np.ndarray:
    """Fit k integer centroids (full-dim L2 k-means) on the bounded
    hash-ordered sample — shape (k, dim), int64. At corpus scale this is
    the standard fit-on-sample / assign-distributed split (IVF
    precedent); the collect is hard-bounded at `sample` rows."""
    pdf = (
        embeddings.select(id_col, col)
        .orderBy(
            F.pmod(F.col(id_col) * F.lit(IVF_SAMPLE_MULT), F.lit(IVF_SAMPLE_MOD)),
            id_col,
        )
        .limit(sample)
        .toPandas()
    )
    x = np.floor(
        np.stack(pdf[col].apply(np.asarray).to_numpy()).astype(np.float64) * scale
    ).astype(np.int64)
    return _kmeans_l2_int(x, k, iters)


def semdedup_centroids_numpy(
    parquet_path: str,
    k: int = 8,
    iters: int = 4,
    sample: int = 4096,
    scale: int = SEM_SCALE,
    perturb_every: int | None = None,
    perturb_eps: float = 0.2,
    id_offset: int = 1000000,
) -> np.ndarray:
    """Recompute semdedup_fit_centroids bit-for-bit from parquet without
    Spark (the oracle side; ivf_centroids_numpy pattern). When
    `perturb_every` is set, the planted near-copies (e + eps * reverse(e)
    at id + id_offset, the driver-query corpus) are appended before the
    sample ordering — the fit sees the same corpus the engine does."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=["vec_id", "embedding"])
    vec_id = np.asarray(t.column("vec_id")).astype(np.int64)
    emb = np.stack([np.asarray(v) for v in t.column("embedding").to_pylist()]).astype(
        np.float64
    )
    if perturb_every:
        m = vec_id % perturb_every == 0
        vec_id = np.concatenate([vec_id, vec_id[m] + id_offset])
        emb = np.concatenate([emb, emb[m] + perturb_eps * emb[m, ::-1]])
    key = (vec_id * IVF_SAMPLE_MULT) % IVF_SAMPLE_MOD
    order = np.lexsort((vec_id, key))[:sample]
    x = np.floor(emb[order] * scale).astype(np.int64)
    return _kmeans_l2_int(x, k, iters)


def semdedup_prune(
    embeddings: DataFrame,
    centroids: np.ndarray,
    tau_num: int = 9,
    tau_den: int = 10,
    scale: int = SEM_SCALE,
    id_col: str = "vec_id",
    col: str = "embedding",
    neighborhood: int | None = None,
) -> DataFrame:
    """One row per input vector: (id, cluster, kept, dup_of).

    `neighborhood=None` (exact SemDeDup): every within-cluster pair is
    tested. `neighborhood=w`: linear candidates — members sort by
    (centroid-dot desc, id) inside their cluster and each member is
    tested only against its next w-1 neighbors (skew guard; see module
    docstring for the recall contract).
    """
    k, dim = centroids.shape
    iv = _quant(col, scale)
    base = embeddings.select(F.col(id_col).alias("vid"), iv.alias("iv"))

    cent_lits = [
        F.array(*[F.lit(int(v)).cast("long") for v in centroids[j]]) for j in range(k)
    ]
    d2s = [
        F.aggregate(
            F.zip_with(F.col("iv"), cent_lits[j], lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for j in range(k)
    ]
    pick = F.array_min(
        F.array(
            *[
                F.struct(d2s[j].alias("d"), F.lit(j).cast("long").alias("j"))
                for j in range(k)
            ]
        )
    )["j"]
    n2 = _int_dot(F.col("iv"), F.col("iv"))
    asn = base.select(
        "vid", "iv", pick.alias("cluster"), n2.alias("n2")
    )

    if neighborhood is None:
        a = asn.select(
            F.col("vid").alias("a_vid"),
            F.col("iv").alias("a_iv"),
            F.col("n2").alias("a_n2"),
            "cluster",
        )
        b = asn.select(
            F.col("vid").alias("b_vid"),
            F.col("iv").alias("b_iv"),
            F.col("n2").alias("b_n2"),
            "cluster",
        )
        pairs = a.join(b, "cluster").filter(F.col("a_vid") < F.col("b_vid"))
        dot = _int_dot(F.col("a_iv"), F.col("b_iv"))
    else:
        cdot = F.array(*[_int_dot(F.col("iv"), cent_lits[j]) for j in range(k)])[
            F.col("cluster").cast("int")
        ]
        ordered = asn.withColumn("cdot", cdot)
        w = Window.partitionBy("cluster").orderBy(
            F.col("cdot").desc(), F.col("vid").asc()
        )
        nbr = F.array(
            *[
                F.lead(F.struct("vid", "iv", "n2"), i).over(w)
                for i in range(1, neighborhood)
            ]
        )
        pairs = (
            ordered.withColumn("nbr", nbr)
            .select(
                "cluster",
                F.col("vid").alias("x_vid"),
                F.col("iv").alias("x_iv"),
                F.col("n2").alias("x_n2"),
                F.explode("nbr").alias("y"),
            )
            .filter(F.col("y").isNotNull())
            .select(
                "cluster",
                F.least("x_vid", "y.vid").alias("a_vid"),
                F.greatest("x_vid", "y.vid").alias("b_vid"),
                F.col("x_iv").alias("a_iv"),
                F.col("y.iv").alias("b_iv"),
                F.col("x_n2").alias("a_n2"),
                F.col("y.n2").alias("b_n2"),
            )
        )
        dot = _int_dot(F.col("a_iv"), F.col("b_iv"))

    dominated = (
        pairs.withColumn("dot", dot)
        .filter(
            (F.col("dot") > 0)
            & (
                F.col("dot") * F.col("dot") * F.lit(tau_den * tau_den)
                >= F.lit(tau_num * tau_num) * F.col("a_n2") * F.col("b_n2")
            )
        )
        .groupBy(F.col("b_vid").alias("vid"))
        .agg(F.min("a_vid").alias("dup_of"))
    )
    return (
        asn.join(dominated, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            F.col("cluster").cast("bigint").alias("cluster"),
            F.col("dup_of").isNull().alias("kept"),
            F.col("dup_of").cast("bigint").alias("dup_of"),
        )
    )
