"""HMM map matching: bounded-step Viterbi over snap candidates.

The reference's pipeline ends at geometry reconstruction and rendering
(WayAssembler J2, Rasterizer); a telemetry consumer of a planet road
network needs the inverse — matching noisy GPS traces onto segments.
`snap_points` (operators/snap.py) is the memoryless stage; this adds the
sequential decoding of Newson & Krumm's HMM matcher: per trip, choose a
segment per step minimizing emission cost (quantized squared
point-to-segment distance, the exact integer d2q that snap computes)
plus a switch penalty whenever consecutive steps change segment.

Exactness: d2q is already exact fixed-point int64; the transition term
is `penalty` (an int in the same fixed-point scale) times an indicator,
so every DP score is exact int64 and the table is bit-identical across
engines.

Plan shape — the min-plus recursion without a K x K candidate join:

    score_k(s) = emis_k(s) + min(score_{k-1}(s), best_{k-1} + penalty)

because min over s' of score_{k-1}(s') + penalty*(s != s') collapses:
if the global argmin IS s, then best + penalty >= score_{k-1}(s) and the
stay term wins, so taking the global best (one per-trip min aggregate)
never changes the minimum. Each round is therefore one slim aggregate
plus one (trip, seg, score) equi-join — no pairwise transition product,
which is
what makes candidate fan-out survivable at 100 TB (urban cells can put
hundreds of segments in radius; K x K would square that). Rounds are
localCheckpoint'ed like the kNN/flow-accumulation precedents so the
chain is never re-executed per consumer.

The operator returns the FULL DP table (trip_id, k, seg_id, score) —
richer than the decoded path and verifiable without backtracking; the
DuckDB twin unrolls the identical recursion step by step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.snap import snap_candidates

_INF = 1 << 50


def viterbi_map_match(
    points: DataFrame,
    segments: DataFrame,
    radius: int,
    penalty: int,
    steps: int,
    cell_size: int | None = None,
    scale_bits: int = 20,
    checkpoint: bool = True,
) -> DataFrame:
    """DP table of the min-cost segment assignment per trip step.

    points:   (trip_id, k, x, y) with k = 1..steps, integer coords.
    segments: (seg_id, ax, ay, bx, by) integer endpoints.
    Only trips where EVERY step has at least one candidate in `radius`
    participate (a broken chain has no well-defined score). Returns
    (trip_id, k, seg_id, score): score = minimum total cost of any
    assignment of steps 1..k that ends on seg_id at step k.
    """
    cand = snap_candidates(points, segments, radius, cell_size, scale_bits)
    full = (
        cand.select("trip_id", "k")
        .distinct()
        .groupBy("trip_id")
        .count()
        .filter(F.col("count") == steps)
        .select("trip_id")
    )
    cand = cand.join(full, "trip_id", "left_semi")
    if checkpoint:
        cand = cand.localCheckpoint(eager=True)

    score = cand.filter(F.col("k") == 1).select(
        "trip_id", "seg_id", F.col("d2q").cast("long").alias("score")
    )
    if checkpoint:
        score = score.localCheckpoint(eager=True)
    out = score.select("trip_id", F.lit(1).cast("long").alias("k"), "seg_id", "score")

    for t in range(2, steps + 1):
        best = score.groupBy("trip_id").agg(F.min("score").alias("best"))
        stay = score.select(
            "trip_id", "seg_id", F.col("score").alias("pscore")
        )
        score = (
            cand.filter(F.col("k") == t)
            .join(best, "trip_id")
            .join(stay, ["trip_id", "seg_id"], "left")
            .select(
                "trip_id",
                "seg_id",
                (
                    F.col("d2q")
                    + F.least(
                        F.coalesce(F.col("pscore"), F.lit(_INF)),
                        F.col("best") + F.lit(penalty),
                    )
                ).cast("long").alias("score"),
            )
        )
        if checkpoint:
            score = score.localCheckpoint(eager=True)
        out = out.unionByName(
            score.select(
                "trip_id", F.lit(t).cast("long").alias("k"), "seg_id", "score"
            )
        )
    return out
