"""Deterministic random-walk corpus generation (DeepWalk/node2vec's
data stage) — hash-derived choices, one equi-join per step.

Graph-embedding pretraining (DeepWalk, Perozzi 2014; node2vec, Grover
2016) starts by materializing a CORPUS of truncated random walks — at
planet scale that corpus generation, not the SGD that follows, is the
Spark-shaped job (the sequences feed the same skip-gram pipeline as
text). The reference has no graph-ML stage at all; this extends the
road-graph family (routing.py BFS/SSSP/PageRank) with the corpus
generator, deterministic end to end so the DuckDB twin replays the
same walks bit-for-bit.

Determinism: step t of walk (start, w) draws its neighbor RANK as

    h60(tag || start || '_' || w || '_' || t)  %  deg(cur)

and resolves the rank against the per-node neighbor list ordered by
destination id (row_number, ties impossible on distinct edges). No
RNG, no seed state — the engine's shared h60 discipline, so walks are
reproducible across retries, partitionings, and engines (the property
a 1000-executor resume needs; true RNG walks are not replayable).

Plan shape: the neighbor table carries each DESTINATION's degree
(`dv`), so the walk state always knows the modulus of its NEXT draw
and every step is ONE equi-join on (cur, rank) — no fan-out-and-
filter (which would amplify each walk by deg(cur) before selecting
one row), no second degree join per step. `length` bounded rounds;
frontier width is constant (n_starts * walks_per_node rows, 4 ints
each); periodic localCheckpoint keeps the plan linear. At 100 TB the
neighbor table is bucketed by u once and every step's shuffle is the
walk side only.

Sinks: a node with out-degree 0 has no next rank (mod 0). Callers
pass a symmetrized edge set (sinkless by construction — the label-prop
/ PageRank convention); the operator drops any walk that would step
from a sink, matching the SQL twin's inner join exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    length: int = 5,
    tag: str = "dw",
    checkpoint_every: int = 8,
) -> DataFrame:
    """DataFrame(start, w, t, node): walks_per_node truncated walks of
    `length` steps from every node with out-degree >= 1; t = 0 is the
    start node itself. Directed edges (u, v); duplicates collapsed."""
    e = edges.select(F.col("u").cast("bigint"), F.col("v").cast("bigint")).distinct()
    wr = Window.partitionBy("u").orderBy("v")
    nbr = e.select(
        "u", "v",
        (F.row_number().over(wr) - 1).cast("bigint").alias("r"),
    )
    deg = e.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    # carry the destination's degree: next step's modulus rides the state
    nbr = nbr.join(deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v", "left") \
             .select(F.col("u").alias("nu"), F.col("v").alias("nv"),
                     F.col("r").alias("nr"),
                     F.coalesce("dv", F.lit(0)).alias("ndv"))
    state = deg.select(
        F.col("u").alias("start"),
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(walks_per_node)])).alias("w"),
        F.col("u").alias("cur"),
        F.col("d").alias("dv"),
    )
    out = [state.select("start", "w", F.lit(0).cast("bigint").alias("t"),
                        F.col("cur").alias("node"))]
    for t in range(1, length + 1):
        draw = h60(
            F.concat(
                F.lit(tag), F.col("start").cast("string"),
                F.lit("_"), F.col("w").cast("string"),
                F.lit("_"), F.lit(str(t)),
            )
        )
        stepped = (
            state.where(F.col("dv") > 0)
            .withColumn("rk", draw % F.col("dv"))
            .join(nbr, (F.col("cur") == F.col("nu")) & (F.col("rk") == F.col("nr")))
            .select("start", "w", F.col("nv").alias("cur"),
                    F.col("ndv").alias("dv"))
        )
        state = stepped
        if t % checkpoint_every == 0 and t < length:
            state = state.localCheckpoint(eager=True)
        out.append(state.select("start", "w", F.lit(t).cast("bigint").alias("t"),
                                F.col("cur").alias("node")))
    res = out[0]
    for p in out[1:]:
        res = res.unionByName(p)
    return res
