"""Record linkage: Fellegi-Sunter pair scoring with lossless blocking.

Entity-resolution SCORING, the step after the dedup families in
operators/dedup.py stop: given two record sets and per-field integer
agreement/disagreement weights (the log-likelihood-ratio weights of
Fellegi & Sunter 1969, fixed-point so every engine agrees bit-for-bit),
emit every cross pair whose summed weight clears a decision threshold.

The scale problem is the candidate product. The standard fix is a
BLOCKING join — only compare pairs agreeing on a chosen field — which in
general loses recall. Here the blocking is chosen to be PROVABLY
lossless: if the best score attainable while DISAGREEING on the blocking
field is still below the threshold, every pair at or above the threshold
must agree on it, so the blocked equi-join enumerates exactly the pairs
the full cross product would. The constructor enforces that inequality
and refuses silently-lossy configurations; the driver oracle
(__spark_entry__.py) runs the BRUTE all-pairs scoring with no blocking —
equality is the completeness proof, the same pattern the engine's
distance/containment/comovement joins use.

Plan: one equi-join on the blocking field (hash, AQE-skew-splittable) +
a whole-stage-codegen CASE sum; no UDF, no state. 100 TB posture: the
shuffle is linear in record volume; per-block fan-out is the classic
blocking-key-skew hazard (a "Smith" block) — mitigate by compound
blocking keys upstream; the scoring itself never materializes the cross
product beyond the block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fs_link(
    a: DataFrame,
    b: DataFrame,
    fields: list[tuple[str, int, int]],
    block_field: str,
    threshold: int,
    id_a: str = "a_id",
    id_b: str = "b_id",
) -> DataFrame:
    """Score a x b record pairs; keep score >= threshold.

    fields: (name, agree_weight, disagree_weight) — agreement on `name`
    adds agree_weight, disagreement subtracts disagree_weight (both
    positive ints). block_field must be one of the field names, and the
    configuration must make blocking lossless:

        max score with block_field disagreeing
          = sum(agree_w of other fields) - disagree_w(block) < threshold

    a: (id_a, *field names); b: (id_b, *field names).
    Returns DataFrame(id_a, id_b, score), all bigint.
    """
    names = [f[0] for f in fields]
    if block_field not in names:
        raise ValueError(f"block_field {block_field!r} not in fields")
    best_without_block = sum(
        wa for (n, wa, _) in fields if n != block_field
    ) - next(wd for (n, _, wd) in fields if n == block_field)
    if best_without_block >= threshold:
        raise ValueError(
            "lossy blocking: a pair disagreeing on "
            f"{block_field!r} can still reach {best_without_block} >= "
            f"threshold {threshold}; raise the threshold or the blocking "
            "field's weights"
        )
    left = a.select(
        F.col(id_a), *[F.col(n).alias(f"a_{n}") for n in names]
    )
    right = b.select(
        F.col(id_b), *[F.col(n).alias(f"b_{n}") for n in names]
    )
    cand = left.join(
        right, F.col(f"a_{block_field}") == F.col(f"b_{block_field}")
    )
    score = None
    for n, wa, wd in fields:
        term = F.when(
            F.col(f"a_{n}") == F.col(f"b_{n}"), F.lit(int(wa))
        ).otherwise(F.lit(-int(wd)))
        score = term if score is None else score + term
    return (
        cand.select(
            F.col(id_a),
            F.col(id_b),
            score.cast("bigint").alias("score"),
        )
        .filter(F.col("score") >= int(threshold))
    )


def pair_confusion(
    assignments: DataFrame,
    item: str = "item",
    pred: str = "pred",
    truth: str = "truth",
) -> DataFrame:
    """Exact pair-level confusion census between a predicted clustering
    and ground truth — the evaluation layer over this module's linkage
    and the dedup family's cluster outputs (dedup_clusters,
    semdedup_prune): Rand / precision / recall on PAIRS, computed
    WITHOUT materializing any pair.

    With contingency counts n_ij = |pred cluster i ∩ truth cluster j|
    and marginals n_i., n_.j over n items (C2(x) = x(x-1)/2):

        tp = Σ_ij C2(n_ij)            same-pred AND same-truth pairs
        fp = Σ_i C2(n_i.) - tp        same-pred, different-truth
        fn = Σ_j C2(n_.j) - tp        different-pred, same-truth
        tn = C2(n) - tp - fp - fn

    One row (n_items, tp, fp, fn, tn), all int64 — pair precision
    tp/(tp+fp), recall tp/(tp+fn), Rand (tp+tn)/C2(n), and the ARI all
    derive from these four at presentation time.

    Plan: one (pred, truth) hash aggregate + two marginal re-aggregates
    of THAT contingency relation (bounded by cluster-pair count, far
    below item count) — three partial-aggregatable groupBys, no join
    wider than one row.  Scales to any clustering the engine can hold.
    """
    a = assignments.select(
        F.col(item).alias("item"),
        F.col(pred).alias("pred"),
        F.col(truth).alias("truth"),
    )
    cont = a.groupBy("pred", "truth").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # C2 via shiftright: x(x-1) is always even, so >>1 is the exact
    # integer half — no double division (which loses bits past 2^53)
    c2 = lambda col: F.shiftright((col * (col - 1)).cast("bigint"), 1)  # noqa: E731
    tp_row = cont.agg(
        F.sum(c2(F.col("c"))).cast("long").alias("tp"),
        F.sum("c").cast("long").alias("n_items"),
    )
    predm = (
        cont.groupBy("pred").agg(F.sum("c").alias("m"))
        .agg(F.sum(c2(F.col("m"))).cast("long").alias("pred_pairs"))
    )
    truthm = (
        cont.groupBy("truth").agg(F.sum("c").alias("m"))
        .agg(F.sum(c2(F.col("m"))).cast("long").alias("truth_pairs"))
    )
    out = tp_row.crossJoin(F.broadcast(predm)).crossJoin(F.broadcast(truthm))
    n = F.col("n_items")
    return out.select(
        "n_items",
        "tp",
        (F.col("pred_pairs") - F.col("tp")).cast("bigint").alias("fp"),
        (F.col("truth_pairs") - F.col("tp")).cast("bigint").alias("fn"),
        (
            c2(n) - F.col("pred_pairs") - F.col("truth_pairs") + F.col("tp")
        ).cast("bigint").alias("tn"),
    )


def single_linkage_cut(
    edges: DataFrame,
    nodes: DataFrame,
    threshold: int,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    node: str = "id",
    msf: DataFrame | None = None,
) -> DataFrame:
    """Flat single-linkage clustering at a distance threshold: the
    dendrogram cut that turns the dedup pipeline's pairwise distances
    into cluster labels — (id, cluster), cluster = minimum member id,
    isolated nodes singletons.

    Single-linkage clusters at threshold T are EXACTLY the connected
    components of the graph restricted to edges with w <= T, and the
    minimum spanning forest preserves them (cut property: the lightest
    edge leaving any sub-cluster is in the MSF), so the cut runs on the
    FOREST — n-1 edges — not the full candidate set: build the MSF once
    (operators/mst.py Borůvka), then every threshold is a filter + a
    components pass over forest-sized data. Sweeping a threshold ladder
    re-reads the same forest; the candidate edges are scanned once.

    Plan: boruvka_msf (log-round), one filter, cc.py components on
    <= n-1 edges, one left join for singletons. 100 TB posture is the
    MSF's; everything after it is forest-sized.
    """
    from osm_hadoop_spark.operators.cc import connected_components
    from osm_hadoop_spark.operators.mst import boruvka_msf

    if msf is None:  # pass a prebuilt forest to sweep thresholds over it
        msf = boruvka_msf(edges, src=src, dst=dst, weight=weight)
    kept = msf.filter(F.col("w") <= F.lit(threshold))
    comp = connected_components(kept, "u", "v").select(
        F.col("node").alias(node), F.col("component").alias("cluster")
    )
    return nodes.select(node).join(comp, node, "left").select(
        node, F.coalesce("cluster", F.col(node)).alias("cluster")
    )
