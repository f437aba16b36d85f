"""Maximal independent set: Luby-style parallel greedy, made deterministic.

The symmetry-breaking primitive of distributed graph computing (conflict
scheduling, parallel greedy coloring, landmark selection). Luby's
algorithm draws random priorities; here the priority is the repo's
shared h60 hash of the node id, which makes the run DETERMINISTIC while
keeping the O(log n) expected round count of a random order (hash values
are pseudo-random in the node id).

Per round, every active node u enters the MIS iff its (priority, id)
pair is a strict local minimum among active neighbors; winners and their
neighbors deactivate. This parallel rule provably yields EXACTLY the
sequential greedy MIS taken in (priority, id) order — which is what the
unrolled SQL twin replays — because a node is selected iff it precedes
all its neighbors that survive earlier prefixes, an order-free fixpoint.

Every round is relational: one adjacency-vs-active semi-join, one
neighbor-smaller anti-join, two deactivation anti-joins, each ending in
the engine's localCheckpoint fixpoint discipline. Isolated active nodes
have no smaller neighbor, so they always select — the loop strictly
shrinks the active set and terminates.

100 TB posture: state per round is the (node) active set and the slim
(u, v) active adjacency, shuffled on node ids; hub nodes only amplify
the neighbor-min join linearly in degree. The documented hazard is the
round count on adversarial priority orders (a path ordered monotonically
needs O(n) rounds) — the h60 priority makes that measure-zero, and
max_rounds guards it; the general mitigation is re-hashing the priority
per round (classic Luby), which the deterministic twin deliberately
trades away for replayability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


def _priority(col):
    return h60(F.concat(F.lit("mp"), col.cast("string")))


def luby_mis(
    edges: DataFrame, src: str = "u", dst: str = "v", max_rounds: int = 40,
) -> DataFrame:
    """(node, in_mis) over every node appearing in edges, in_mis true for
    the deterministic greedy-by-h60-priority maximal independent set."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # priorities are MATERIALIZED once on the adjacency (md5 per edge per
    # round was the measured cost: 10.8 s -> see PARITY round-3 audits),
    # so each round's local-minimum filter is a plain column comparison.
    adj = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .withColumn(
            "worse_v",
            (_priority(F.col("v")) < _priority(F.col("u")))
            | (
                (_priority(F.col("v")) == _priority(F.col("u")))
                & (F.col("v") < F.col("u"))
            ),
        )
        .localCheckpoint(eager=True)
    )
    nodes = adj.select("u").distinct()
    active = nodes.localCheckpoint(eager=True)
    winner_rounds = []
    for _ in range(max_rounds):
        aa = (
            adj.join(active, "u", "semi")
            .join(active.select(F.col("u").alias("v")), "v", "semi")
        )
        worse = aa.filter("worse_v").select("u").distinct()
        winners = active.join(worse, "u", "anti").localCheckpoint(eager=True)
        winner_rounds.append(winners)
        dropped = winners.unionByName(
            aa.join(winners, "u", "semi").select(F.col("v").alias("u"))
        ).distinct()
        active = active.join(dropped, "u", "anti").localCheckpoint(eager=True)
        if active.count() == 0:
            break
    else:
        raise RuntimeError("luby_mis: max_rounds exhausted before fixpoint")
    picked = winner_rounds[0]
    for w in winner_rounds[1:]:
        picked = picked.unionByName(w)
    return nodes.join(
        picked.withColumn("in_mis", F.lit(True)), "u", "left"
    ).select(
        F.col("u").alias("node"),
        F.coalesce(F.col("in_mis"), F.lit(False)).alias("in_mis"),
    )
