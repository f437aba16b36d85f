"""Distributed greedy graph coloring, deterministic (the Jones-Plassmann
algorithm with hash priorities — the scheduling/register-allocation twin
of operators/mis.py::luby_mis).

Sequential greedy coloring visits vertices in some total order and gives
each the smallest color unused by its earlier neighbors. Jones &
Plassmann (1993) showed the same assignment is computable in parallel
rounds: a vertex colors itself as soon as ALL its earlier-ordered
neighbors are colored, taking the mex of their colors. With the repo's
deterministic h60 priority as the order, every round is relational and
the result is EXACTLY the sequential greedy coloring in (priority, id)
order — which the unrolled SQL twin replays.

Per round: one semi-join finds still-blocked vertices (an uncolored
earlier neighbor exists), the complement is the frontier; the frontier's
earlier-colored neighbor colors aggregate into a sorted distinct array
whose mex is a single fold — smallest acc in 0.. not present. Colors are
bounded by degree+1 (greedy bound), so the fold arrays stay tiny.

100 TB posture: identical to luby_mis — slim (u, v) adjacency with
priorities materialized ONCE (md5 per round was the measured MIS cost),
per-round state is the uncolored set, localCheckpoint bounds lineage.
Round count is the longest priority-decreasing path: O(log n / log log n)
expected for hash priorities (Jones-Plassmann analysis); max_rounds
guards adversarial orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


def _priority(col: Column) -> Column:
    return h60(F.concat(F.lit("gc"), col.cast("string")))


def mex_of_sorted(cs: Column) -> Column:
    """Smallest non-negative integer absent from a SORTED DISTINCT
    bigint array: fold left, bumping the candidate past every match."""
    return F.aggregate(
        cs, F.lit(0).cast("bigint"),
        lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
    )


def greedy_coloring(
    edges: DataFrame, src: str = "u", dst: str = "v", max_rounds: int = 60,
) -> DataFrame:
    """(node, color) — the sequential greedy coloring of the undirected
    simple graph in (h60 priority, id) vertex order."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .withColumn(
            "earlier_v",
            (_priority(F.col("v")) < _priority(F.col("u")))
            | (
                (_priority(F.col("v")) == _priority(F.col("u")))
                & (F.col("v") < F.col("u"))
            ),
        )
        .localCheckpoint(eager=True)
    )
    nodes = adj.select("u").distinct()
    uncolored = nodes.localCheckpoint(eager=True)
    colored = None  # (u, color), grows by one checkpointed frame per round
    for _ in range(max_rounds):
        before = adj.filter("earlier_v").join(uncolored, "u", "semi")
        blocked = (
            before.join(uncolored.select(F.col("u").alias("v")), "v", "semi")
            .select("u")
            .distinct()
        )
        frontier = uncolored.join(blocked, "u", "anti")
        if colored is None:
            newly = frontier.select("u", F.lit(0).cast("bigint").alias("color"))
        else:
            used = (
                before.join(frontier, "u", "semi")
                .join(
                    colored.select(F.col("u").alias("v"), "color"), "v"
                )
                .groupBy("u")
                .agg(F.array_sort(F.collect_set("color")).alias("cs"))
            )
            newly = frontier.join(used, "u", "left").select(
                "u",
                F.coalesce(
                    mex_of_sorted(F.col("cs")), F.lit(0).cast("bigint")
                ).alias("color"),
            )
        newly = newly.localCheckpoint(eager=True)
        colored = newly if colored is None else colored.unionByName(newly)
        uncolored = uncolored.join(newly, "u", "anti").localCheckpoint(eager=True)
        if uncolored.count() == 0:
            break
    else:
        raise RuntimeError("greedy_coloring: max_rounds exhausted before fixpoint")
    return colored.select(F.col("u").alias("node"), "color")
