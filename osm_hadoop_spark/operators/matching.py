"""Maximal matching: parallel greedy by hash priority, deterministic.

The edge-side symmetry-breaking primitive next to mis.py's node-side
one — a maximal matching is exactly a maximal independent set of the
LINE graph, and this module runs the same Luby-style parallel greedy
there without ever materializing the line graph: per round an active
edge enters the matching iff its (priority, u, v) triple is the strict
minimum among active edges sharing either endpoint, then matched nodes
(and every edge touching them) deactivate. The parallel fixpoint
provably equals the SEQUENTIAL greedy matching taken in (priority, u,
v) order — the mis.py argument verbatim on the line graph — which is
what the unrolled SQL twin replays.

Uses: one-round load pairing (each worker matched to at most one
peer), dedup-pair arbitration (pick a disjoint set of merge pairs so a
round of merges is conflict-free), and the classic 2-approximation of
maximum matching / vertex cover.

Per round, everything is relational: one (node, edge) emission, one
per-node argmin hash aggregate (min of a (p, u, v) struct — partial-
aggregatable), two equi-joins proving the edge is the minimum at BOTH
endpoints, and two anti-joins deactivating matched endpoints, each
round closed by the engine's localCheckpoint fixpoint discipline.

100 TB posture: per-round state is the slim active edge list shuffled
on node ids; hubs amplify the argmin linearly in degree (a hash
aggregate, so map-side partials absorb skew). Round count is O(log m)
in expectation under the pseudo-random h60 priority (the classic Luby
bound); adversarial priority orders (a monotone path) are the same
documented measure-zero hazard as mis.py, guarded by max_rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


def greedy_matching(
    edges: DataFrame, src: str = "u", dst: str = "v", max_rounds: int = 40,
) -> DataFrame:
    """(u, v) rows of the deterministic maximal matching: the greedy
    matching in ascending (h60('me' u '_' v), u, v) edge order."""
    e = (
        edges.select(F.least(src, dst).alias("u"),
                     F.greatest(src, dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .withColumn(
            "p",
            h60(F.concat(F.lit("me"), F.col("u").cast("string"),
                         F.lit("_"), F.col("v").cast("string"))),
        )
        .localCheckpoint(eager=True)
    )
    active = e
    round_wins = []
    for _ in range(max_rounds):
        if active.limit(1).count() == 0:
            break
        key = F.struct("p", "u", "v").alias("k")
        ends = active.select(F.col("u").alias("node"), key).unionByName(
            active.select(F.col("v").alias("node"), key)
        )
        nmin = ends.groupBy("node").agg(F.min("k").alias("mk"))
        winners = (
            active.join(nmin.select(F.col("node").alias("u"),
                                    F.col("mk").alias("mu")), "u")
            .join(nmin.select(F.col("node").alias("v"),
                              F.col("mk").alias("mv")), "v")
            .filter(
                (F.struct("p", "u", "v") == F.col("mu"))
                & (F.struct("p", "u", "v") == F.col("mv"))
            )
            .select("u", "v", "p")
            .localCheckpoint(eager=True)
        )
        round_wins.append(winners)
        matched = winners.select(F.col("u").alias("node")).unionByName(
            winners.select(F.col("v").alias("node"))
        )
        active = (
            active.join(matched.select(F.col("node").alias("u")), "u", "anti")
            .join(matched.select(F.col("node").alias("v")), "v", "anti")
            .localCheckpoint(eager=True)
        )
    else:
        # the fixpoint can land exactly on the final round (the last
        # deactivation empties `active` after its top-of-loop check ran) —
        # only raise if edges genuinely remain active
        if active.limit(1).count() != 0:
            raise RuntimeError("greedy_matching: max_rounds exhausted")
    if not round_wins:
        return e.filter(F.lit(False)).select("u", "v")
    out = round_wins[0]
    for w in round_wins[1:]:
        out = out.unionByName(w)
    return out.select("u", "v")
