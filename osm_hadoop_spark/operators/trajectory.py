"""Trip segmentation: split per-entity trajectories on time gaps and
spatial jumps, then roll up per-trip statistics.

T3 in the engine's temporal family. sessionize_events (session_window /
lag-gap rule) splits on TIME only; a trajectory pipeline (vehicle pings,
GPS traces, edit histories with coordinates) additionally breaks a trip
when the entity TELEPORTS — a jump larger than physically plausible
between consecutive pings (GPS glitch, ferry, data stitching). The
rule, per entity ordered by (ts, id):

    new trip  <=>  first ping
               OR  ts - prev_ts > gap
               OR  (x-prev_x)^2 + (y-prev_y)^2 > jump^2

trip ids are the running count of breaks (dense, 0-based, per entity);
per-trip rollup = ping count, start/end time, and the integer Manhattan
path length (|dx|+|dy| summed over WITHIN-trip moves — exact in any
engine, unlike a float Euclidean sum whose value depends on addition
order).

Plan: two window passes over the SAME (entity, ts, id) sort order —
Catalyst plans one Exchange + one Sort and runs both Window operators
pipelined on it (asserted in tests/test_trajectory.py) — then one hash
aggregate. Everything is whole-stage-codegen JVM; no Python.

100 TB posture: the only shuffle key is the entity id (natural
trajectory partitioning); window state is O(1) per row (lag-1 values and
a running sum); the rollup is partial-aggregatable. Skewed entities (one
device with billions of pings) are the known hazard of any
per-entity-ordered operator — same caveat as sessionize/asof, mitigated
upstream by time-bucketing the entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def segment_trips(
    pings: DataFrame,
    gap_us: int,
    jump: int,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    x: str = "x",
    y: str = "y",
    order_tiebreak: str = "ping_id",
    endpoints: bool = False,
) -> DataFrame:
    """Per-trip rollup of a ping stream.

    Returns DataFrame(entity, trip, n_pings, start_us, end_us,
    manhattan_len) — trip is 0-based per entity; manhattan_len sums
    |dx|+|dy| over consecutive within-trip pings (0 for 1-ping trips).
    With endpoints=True, appends start_x/start_y/end_x/end_y (the first/
    last ping of the trip — min/max over the lexicographic
    (ts, tiebreak, x, y) struct, exact because (ts, tiebreak) is unique),
    the columns an origin-destination flow matrix needs.
    """
    w = Window.partitionBy(entity).orderBy(ts_us, order_tiebreak)
    dx = F.col(x) - F.lag(x).over(w)
    dy = F.col(y) - F.lag(y).over(w)
    dt = F.col(ts_us) - F.lag(ts_us).over(w)
    is_break = (
        dt.isNull() | (dt > gap_us) | (dx * dx + dy * dy > jump * jump)
    ).cast("bigint")
    stepped = pings.select(
        F.col(entity),
        F.col(ts_us),
        F.col(order_tiebreak),
        F.col(x),
        F.col(y),
        is_break.alias("_brk"),
        # within-trip move length; 0 on the break row (trip-opening ping)
        F.when(is_break == 1, F.lit(0))
        .otherwise(F.abs(dx) + F.abs(dy))
        .alias("_move"),
    )
    wc = (
        Window.partitionBy(entity)
        .orderBy(ts_us, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NOTE: _brk of the current row is included -> first trip gets id 1;
    # subtract 1 for a 0-based dense trip index
    tripped = stepped.select(
        F.col(entity),
        F.col(ts_us),
        (F.sum("_brk").over(wc) - 1).alias("trip"),
        F.col("_move"),
        F.struct(ts_us, order_tiebreak, x, y).alias("_ping"),
    )  # wc orders by the carried tiebreak column, then it is dropped
    aggs = [
        F.count(F.lit(1)).alias("n_pings"),
        F.min(ts_us).alias("start_us"),
        F.max(ts_us).alias("end_us"),
        F.sum("_move").alias("manhattan_len"),
    ]
    if endpoints:
        aggs += [
            F.min("_ping")[x].alias("start_x"),
            F.min("_ping")[y].alias("start_y"),
            F.max("_ping")[x].alias("end_x"),
            F.max("_ping")[y].alias("end_y"),
        ]
    return tripped.groupBy(entity, "trip").agg(*aggs)


def dwell_segments(
    pings: DataFrame,
    cell_size: int,
    min_dwell: int,
    min_pings: int = 1,
    entity: str = "entity",
    t: str = "t",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Stay-point (dwell) detection — the grid-RLE reformulation.

    T4 next to segment_trips: where trips split a trajectory on MOVEMENT
    discontinuities, stay points find the places an entity REMAINS —
    home/work discovery, depot dwell time, POI visit mining (Li et al.
    2008 introduced the radius-from-anchor scan). The classic algorithm
    is a sequential per-anchor loop and does not distribute; this is the
    standard grid reformulation (the same exactness-for-scale trade the
    engine's grid DBSCAN documents): a stay is a maximal RUN of
    consecutive pings in the SAME grid cell lasting >= min_dwell with
    >= min_pings pings. Runs at a cell border can fragment (mitigate
    with overlapping passes at a shifted grid, the multi-pass amplifier);
    within-cell wander is bounded by cell_size by construction.

    Semantics (pure function of the input): pings order per entity by
    (t, seq); run breaks exactly when the cell changes; a run reports
    its cell, [t0, t1], and ping count. All integers.

    Plan: ONE exchange on the entity key + one sort, a lag flag, a
    running-sum window on the same sort (pipelined, no second exchange),
    one partial-agg rollup — the segment_trips plan shape with a cell
    equality instead of a jump predicate.
    """
    cx = F.floor(F.col(x) / F.lit(cell_size)).cast("bigint")
    cy = F.floor(F.col(y) / F.lit(cell_size)).cast("bigint")
    w = Window.partitionBy(entity).orderBy(t, seq)
    keyed = pings.select(
        F.col(entity).alias("entity"), F.col(t).alias("t"), F.col(seq).alias("seq"),
        cx.alias("cx"), cy.alias("cy"),
    )
    brk = (
        F.lag("cx").over(w).isNull()
        | (F.lag("cx").over(w) != F.col("cx"))
        | (F.lag("cy").over(w) != F.col("cy"))
    ).cast("bigint")
    runs = keyed.withColumn("run_id", F.sum(brk).over(
        Window.partitionBy("entity").orderBy("t", "seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    ))
    return (
        runs.groupBy("entity", "run_id")
        .agg(
            F.min("cx").alias("cx"),
            F.min("cy").alias("cy"),
            F.min("t").alias("t0"),
            F.max("t").alias("t1"),
            F.count(F.lit(1)).cast("bigint").alias("n_pings"),
        )
        .filter(
            (F.col("t1") - F.col("t0") >= F.lit(min_dwell))
            & (F.col("n_pings") >= F.lit(min_pings))
        )
    )


def comovement(
    pings: DataFrame,
    radius: int,
    min_run: int,
    entity: str = "user_id",
    tick: str = "tick",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Companion detection (co-movement pattern mining).

    T5 in the trajectory family: find ordered entity pairs (a < b) that
    travel TOGETHER — within Chebyshev distance <= radius at >= min_run
    CONSECUTIVE shared ticks (convoy/flock mining a la Jeung et al. 2008,
    restated on an integer grid so every engine agrees bit-for-bit).
    The input must carry exactly one row per (entity, tick).

    Returns DataFrame(a, b, episodes, max_run, co_ticks):
      episodes = number of maximal co-located tick runs of length >=
      min_run; max_run = longest co-located run (qualifying or not);
      co_ticks = total ticks inside qualifying runs. Pairs with zero
      episodes are dropped. All integers — hash-exact across engines.

    Plan (pure JVM, no Python): candidate pairs come from a per-tick
    GRID-BLOCKED equi-join — cell = floor(coord / radius), the left side
    explodes its cell into the 3x3 neighborhood, the right side keeps its
    own cell, so two entities within Chebyshev radius ALWAYS share a
    (tick, cell) join key and each (a, b, tick) meets exactly once (the
    right cell is unique per row). After the exact Chebyshev refine, runs
    are the standard gaps-and-islands: tick - row_number() per pair is
    constant exactly on consecutive-tick runs; one window + two hash
    aggregates finish.

    100 TB posture: the join key is (tick, cell) — time and space
    partition together, so there is never an all-pairs product and the
    shuffle is linear in ping volume x 9. Skew = one dense cell-tick
    (stadium hotspot): occupancy there is what any convoy definition
    must pay; mitigate upstream by capping per-cell candidates or
    sharding hot cells, as operators/distance_join.py documents. The
    window partitions on the PAIR key (fine-grained, no skew).
    """
    r = int(radius)
    p = pings.select(
        F.col(entity).alias("e"),
        F.col(tick).alias("tick"),
        F.col(x).alias("x"),
        F.col(y).alias("y"),
        F.floor(F.col(x).cast("double") / r).cast("bigint").alias("cx"),
        F.floor(F.col(y).cast("double") / r).cast("bigint").alias("cy"),
    )
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    left = (
        p.withColumn("ox", off)
        .withColumn("oy", off)
        .select(
            F.col("e").alias("a"),
            "tick",
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            (F.col("cx") + F.col("ox")).alias("jx"),
            (F.col("cy") + F.col("oy")).alias("jy"),
        )
    )
    right = p.select(
        F.col("e").alias("b"),
        "tick",
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    co = (
        left.join(right, ["tick", "jx", "jy"])
        .filter(F.col("a") < F.col("b"))
        .filter(
            F.greatest(
                F.abs(F.col("ax") - F.col("bx")), F.abs(F.col("ay") - F.col("by"))
            )
            <= r
        )
        .select("a", "b", "tick")
    )
    w = Window.partitionBy("a", "b").orderBy("tick")
    runs = (
        co.withColumn("isl", F.col("tick") - F.row_number().over(w))
        .groupBy("a", "b", "isl")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    q = F.col("run_len") >= int(min_run)
    return (
        runs.groupBy("a", "b")
        .agg(
            F.sum(q.cast("bigint")).alias("episodes"),
            F.max("run_len").cast("bigint").alias("max_run"),
            F.sum(F.when(q, F.col("run_len")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("co_ticks"),
        )
        .filter(F.col("episodes") >= 1)
    )
