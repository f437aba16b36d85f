"""Distributed minimum spanning forest: Borůvka phases, deterministic.

The MST is THE single-linkage clustering primitive (dendrograms are MST
prefixes) and the classic graph operator the dedup pipeline is missing
between pairs (dedup.py families) and flat components (cc.py). Borůvka
is the only textbook MST algorithm that is shuffle-shaped: every phase,
each component picks its lightest incident cross edge (a partial-
aggregatable min), picked edges merge components, component count at
least halves — ≤ log2(n) phases.

Determinism: edges are totally ordered by (w, u, v); distinct keys make
the MSF UNIQUE (the cut/cycle properties bind per-key), so the output is
a pure function of the input — the oracle does not replay Borůvka, it
verifies the cycle property independently (an edge is in the MSF iff its
endpoints are NOT connected by strictly lighter edges), which any MST
algorithm must agree with.

Per phase, everything is relational:
  1. relabel edge endpoints by current component (two equi-joins);
  2. per-component argmin incident cross edge: one hash aggregate over
     the two-sided (label, edge) emission — min(struct(w, u, v, ...));
  3. contract: the picked edges form a graph ON COMPONENT LABELS
     (≤ #components rows — shrinks geometrically); its connected
     components (cc.py's alternating-star operator, reused verbatim)
     become the new labels.

100 TB posture: the full edge relation is touched only by steps 1-2
(joins + one agg per phase, AQE-skew-safe); the nested cc fixpoint runs
on the contracted label graph, which after phase 1 is at most half the
VERTEX count, not the edge count. State per phase = (node, label) plus
the accumulated forest, all localCheckpoint'ed (knn.py round idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.cc import connected_components


def boruvka_msf(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    max_phases: int = 25,
) -> DataFrame:
    """edges(u, v, w) -> the unique minimum spanning forest under the
    total edge order (w, u, v), as rows (u, v, w) with u < v."""
    e = (
        edges.select(
            F.least(src, dst).alias("u"),
            F.greatest(src, dst).alias("v"),
            F.col(weight).alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))  # parallel edges: lightest wins
        .localCheckpoint(eager=True)
    )
    comp = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    forest_rounds = []
    for _ in range(max_phases):
        el = (
            e.join(comp.select(F.col("node").alias("u"),
                               F.col("label").alias("lu")), "u")
            .join(comp.select(F.col("node").alias("v"),
                              F.col("label").alias("lv")), "v")
            .filter(F.col("lu") != F.col("lv"))
        )
        pick = F.struct("w", "u", "v", "lu", "lv").alias("pick")
        cand = el.select(F.col("lu").alias("label"), pick).unionByName(
            el.select(F.col("lv").alias("label"), pick)
        )
        me = (
            cand.groupBy("label")
            .agg(F.min("pick").alias("pick"))
            .localCheckpoint(eager=True)
        )
        if me.limit(1).count() == 0:
            break
        sel = me.select("pick.u", "pick.v", "pick.w").distinct()
        forest_rounds.append(sel.localCheckpoint(eager=True))
        lmap = connected_components(
            me.select("pick.lu", "pick.lv"), "lu", "lv"
        ).select(F.col("node").alias("label"), F.col("component").alias("nl"))
        comp = (
            comp.join(lmap, "label", "left")
            .select("node", F.coalesce("nl", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError("boruvka_msf: max_phases exhausted")
    if not forest_rounds:
        return e.filter(F.lit(False)).select("u", "v", "w")
    out = forest_rounds[0]
    for fr in forest_rounds[1:]:
        out = out.unionByName(fr)
    return out
