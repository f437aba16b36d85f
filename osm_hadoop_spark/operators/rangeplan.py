"""Hilbert range planner: bulk bbox -> minimal exact Hilbert-key
intervals, driver-side for one box and DISTRIBUTED for many.

The read-side completion of the space-filling-curve layout story.
`functions/hilbert.py` gives layout (hilbert_key clustering) and the
Z-order read path (zorder_ranges, driver recursion for ONE box); this
module plans reads against HILBERT-clustered storage, and does it for a
whole TABLE of query boxes at once — the planner itself is a Spark job,
which is what a 10^12-document store needs when "the query" is ten
million tile envelopes from an upstream join, not one bbox typed by a
human. Reference analog: osm-hadoop reads its HBase tables with an
unbounded full `new Scan()` (rasterstats/HBaseTest.scala:19-21) — no
key-range planning exists there at all; on a curve-clustered table the
intervals emitted here become parquet row-group prunes (or HBase
start/stop rows) instead of full scans.

Why Hilbert needs a state machine where Z-order needs none: Morton keys
order the four children of every quadtree node identically (the
Tropf-Herzog descent in zorder_ranges hardcodes NW,NE,SW,SE), but the
Hilbert curve rotates/reflects the traversal per child. The classic
4-state machine below is DERIVED FROM `hilbert_key` itself (empirical
fixpoint over the walk's reachable transforms) and pinned by full
enumeration in tests/test_rangeplan.py, so planner and layout can never
drift apart:

    state -> children in KEY order k=0..3 as (dx, dy, child_state)

The planner is the standard quadtree descent: a node fully inside the
box emits its aligned key run [d, d + side^2 - 1]; a node overlapping
partially expands its 4 children (pruning disjoint ones); single cells
that survive to level 0 are inside by construction. Descent in key
order makes the emitted runs sorted, so minimal-interval form is one
adjacency merge (delegated to islands.merge_islands — gaps-and-islands
over (box, lo)).

Distributed plan shape: `order` bounded rounds (<= 31, typically 8-16);
each round is ONE codegen projection classifying the frontier plus ONE
posexplode of a 4-element state-table literal — no UDF, no join, no
shuffle until the final per-box merge window. Frontier width is
O(perimeter) per box (the textbook O(2^order) bound for an exact
cover), and the periodic localCheckpoint (the kNN per-round pattern)
keeps Catalyst's plan linear in rounds. At 100 TB the box table
partitions arbitrarily — rows never interact until the merge window,
whose key is the box id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.islands import merge_islands

# Hilbert quadtree state machine, derived from functions/hilbert.py's
# hilbert_key walk (rotate-and-reflect, d += s*s*((3*rx)^ry)) and pinned
# against it by full enumeration in tests/test_rangeplan.py. Root is
# state 0. HILBERT_CHILDREN[state][k] = (dx, dy, child_state): the k-th
# child in KEY order occupies quadrant (dx, dy) of its parent.
HILBERT_CHILDREN: dict[int, tuple[tuple[int, int, int], ...]] = {
    0: ((0, 0, 1), (0, 1, 0), (1, 1, 0), (1, 0, 2)),
    1: ((0, 0, 0), (1, 0, 1), (1, 1, 1), (0, 1, 3)),
    2: ((1, 1, 3), (0, 1, 2), (0, 0, 2), (1, 0, 0)),
    3: ((1, 1, 2), (1, 0, 3), (0, 0, 3), (0, 1, 1)),
}


def hilbert_ranges(
    x0: int, x1: int, y0: int, y1: int, order: int
) -> list[tuple[int, int]]:
    """Sorted disjoint minimal Hilbert-key intervals covering exactly
    [x0..x1] x [y0..y1] (inclusive) at the given order — the Hilbert
    twin of functions/hilbert.py::zorder_ranges, for driver-side use
    (single box, e.g. an interactive tile request)."""
    if not (0 <= x0 <= x1 < (1 << order) and 0 <= y0 <= y1 < (1 << order)):
        raise ValueError("bbox out of the order's grid")
    out: list[tuple[int, int]] = []

    def rec(level: int, cx: int, cy: int, d: int, state: int) -> None:
        side = 1 << level
        if cx > x1 or cy > y1 or cx + side - 1 < x0 or cy + side - 1 < y0:
            return
        if x0 <= cx and cx + side - 1 <= x1 and y0 <= cy and cy + side - 1 <= y1:
            out.append((d, d + side * side - 1))
            return
        h = side >> 1
        for k, (dx, dy, cs) in enumerate(HILBERT_CHILDREN[state]):
            rec(level - 1, cx + dx * h, cy + dy * h, d + k * h * h, cs)

    rec(order, 0, 0, 0, 0)
    merged: list[tuple[int, int]] = []
    for lo, hi in out:  # key-order descent => already sorted
        if merged and merged[-1][1] + 1 == lo:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return [tuple(r) for r in merged]


def _children_array(state_col):
    """4-element array<struct<k,dx,dy,cs>> literal selected by state —
    a pure codegen CASE over four array literals."""
    arrays = {}
    for st, kids in HILBERT_CHILDREN.items():
        arrays[st] = F.array(
            *[
                F.struct(
                    F.lit(k).cast("bigint").alias("k"),
                    F.lit(dx).cast("bigint").alias("dx"),
                    F.lit(dy).cast("bigint").alias("dy"),
                    F.lit(cs).cast("int").alias("cs"),
                )
                for k, (dx, dy, cs) in enumerate(kids)
            ]
        )
    expr = arrays[3]
    for st in (2, 1, 0):
        expr = F.when(state_col == st, arrays[st]).otherwise(expr)
    return expr


def hilbert_range_plan(
    boxes: DataFrame,
    order: int,
    id_col: str = "box_id",
    x0: str = "x0",
    x1: str = "x1",
    y0: str = "y0",
    y1: str = "y1",
    checkpoint_every: int = 8,
) -> DataFrame:
    """DataFrame(id_col, lo, hi): per input box, the sorted disjoint
    MINIMAL Hilbert-key intervals covering exactly
    [x0..x1] x [y0..y1] at `order`. Pure DataFrame ops; `order`
    bounded rounds; equals hilbert_ranges per box (pinned in tests).
    """
    if not 1 <= order <= 31:
        raise ValueError("order must be in [1, 31]")
    b = [F.col(c).cast("bigint").alias(n) for c, n in
         ((x0, "bx0"), (x1, "bx1"), (y0, "by0"), (y1, "by1"))]
    frontier = boxes.select(
        F.col(id_col),
        *b,
        F.lit(0).cast("bigint").alias("cx"),
        F.lit(0).cast("bigint").alias("cy"),
        F.lit(0).cast("bigint").alias("dbase"),
        F.lit(0).cast("int").alias("state"),
    )
    pieces: list[DataFrame] = []
    for lvl in range(order, 0, -1):
        side = F.lit(1 << lvl).cast("bigint")
        full = (
            (F.col("cx") >= F.col("bx0"))
            & (F.col("cx") + side - 1 <= F.col("bx1"))
            & (F.col("cy") >= F.col("by0"))
            & (F.col("cy") + side - 1 <= F.col("by1"))
        )
        pieces.append(
            frontier.where(full).select(
                F.col(id_col),
                F.col("dbase").alias("lo"),
                (F.col("dbase") + side * side - 1).alias("hi"),
            )
        )
        h = F.lit(1 << (lvl - 1)).cast("bigint")
        kid = frontier.where(~full).select(
            F.col(id_col), "bx0", "bx1", "by0", "by1", "cx", "cy",
            "dbase",
            F.explode(_children_array(F.col("state"))).alias("c"),
        ).select(
            F.col(id_col), "bx0", "bx1", "by0", "by1",
            (F.col("cx") + F.col("c.dx") * h).alias("cx"),
            (F.col("cy") + F.col("c.dy") * h).alias("cy"),
            (F.col("dbase") + F.col("c.k") * h * h).alias("dbase"),
            F.col("c.cs").alias("state"),
        )
        frontier = kid.where(
            (F.col("cx") <= F.col("bx1"))
            & (F.col("cy") <= F.col("by1"))
            & (F.col("cx") + h - 1 >= F.col("bx0"))
            & (F.col("cy") + h - 1 >= F.col("by0"))
        )
        if lvl > 1 and (order - lvl + 1) % checkpoint_every == 0:
            frontier = frontier.localCheckpoint(eager=True)
    # level-0 survivors are single cells overlapping the box = inside it
    pieces.append(
        frontier.select(
            F.col(id_col),
            F.col("dbase").alias("lo"),
            F.col("dbase").alias("hi"),
        )
    )
    raw = pieces[0]
    for p in pieces[1:]:
        raw = raw.unionByName(p)
    merged = merge_islands(
        raw.select(id_col, "lo", (F.col("hi") + 1).alias("end1")),
        key=id_col, start="lo", end="end1", seq="lo",
    )
    return merged.select(
        F.col(id_col),
        F.col("island_start").alias("lo"),
        (F.col("island_end") - 1).alias("hi"),
    )


def hilbert_plan_scan(
    points: DataFrame,
    key,
    plan: DataFrame,
    id_col: str = "box_id",
) -> DataFrame:
    """Membership scan: rows of `points` whose Hilbert `key` falls in
    any interval of `plan`, tagged with the owning box id. The plan is
    bounded (O(perimeter) intervals per box) so it broadcasts; each
    (point, box) matches <= 1 interval because a box's intervals are
    disjoint — the inner BNLJ's output is exactly the spatial result.

    This is the operational payoff: on a hilbert-clustered table the
    same intervals also prune row groups via parquet min/max stats
    before the per-row check runs (functions/hilbert.py layout notes).
    """
    p = F.broadcast(plan.select(
        F.col(id_col), F.col("lo").alias("_lo"), F.col("hi").alias("_hi")
    ))
    joined = points.join(p, (key >= F.col("_lo")) & (key <= F.col("_hi")))
    return joined.drop("_lo", "_hi")
