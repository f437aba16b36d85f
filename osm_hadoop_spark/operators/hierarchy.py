"""Hierarchy (BOM / org-chart) subtree rollup via path-doubling closure.

The recursive-CTE workload class: given parent pointers (a forest), for
every node aggregate its whole subtree (descendant count + an additive
measure). Engines with WITH RECURSIVE walk the hierarchy level by level
— O(depth) passes. The distributed form here is TRANSITIVE CLOSURE BY
DOUBLING (Valiant-style pointer jumping on relations): round k holds
every (node, ancestor) pair at distance <= 2^k, and one self-join per
round doubles the horizon, so a depth-D hierarchy closes in ceil(log2 D)
joins instead of D. Each round ends in a localCheckpoint (the engine's
fixpoint lineage discipline, same as operators/cc.py / truss.py) and the
loop exits early when the pair count stops growing.

The rollup is then ONE shuffle: (self ∪ closure) join measure, hash
aggregate on the ancestor key — count + sum are partial-aggregatable.

100 TB posture: the closure materializes sum(depth(u)) rows = N * avg
depth; for log-depth hierarchies (the common case — category trees,
BOMs) that is N log N slim (u, a) pairs, shuffled on node ids. The known
hazard is a SUPER-DEEP chain (depth ~ N), where the closure itself is
quadratic — the documented mitigation is level-synchronous rollup from
the leaves (O(depth) rounds, O(N) state), which trades rounds for
memory; the doubling form is the right default at log depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestor_closure(
    parents: DataFrame, src: str = "u", parent: str = "p",
    max_rounds: int = 20,
) -> DataFrame:
    """All PROPER (node, ancestor) pairs of the forest given by one
    (child, parent) row per non-root node. Converges in ceil(log2 depth)
    rounds — pass a 100-deep chain with max_rounds=8 and it still closes
    (pinned in tests/test_hierarchy.py)."""
    c = parents.select(
        F.col(src).alias("u"), F.col(parent).alias("a")
    ).localCheckpoint(eager=True)
    n_prev = c.count()
    for _ in range(max_rounds):
        step = (
            c.alias("l")
            .join(c.alias("r"), F.col("l.a") == F.col("r.u"))
            .select(F.col("l.u").alias("u"), F.col("r.a").alias("a"))
        )
        c = (
            c.unionByName(step)
            .dropDuplicates(["u", "a"])
            .localCheckpoint(eager=True)
        )
        n = c.count()
        if n == n_prev:
            break
        n_prev = n
    return c


def subtree_rollup(
    nodes: DataFrame, parents: DataFrame,
    node: str = "u", measure: str = "m",
    src: str = "u", parent: str = "p",
    max_rounds: int = 20,
) -> DataFrame:
    """(node, n_desc, sum_m): per node, the count and additive measure of
    its whole subtree INCLUDING itself. nodes = (node, measure); parents
    = (child, parent) for non-roots."""
    anc = ancestor_closure(parents, src=src, parent=parent,
                           max_rounds=max_rounds)
    selfrows = nodes.select(F.col(node).alias("u"), F.col(node).alias("a"))
    pairs = selfrows.unionByName(anc.select("u", "a"))
    joined = pairs.join(
        nodes.select(F.col(node).alias("u"), F.col(measure).alias("_m")),
        "u",
    )
    return joined.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_desc"),
        F.sum("_m").cast("bigint").alias("sum_m"),
    )
