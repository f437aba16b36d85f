"""Sketch-based operators for web-scale pruning and summaries (engine
additions — the reference has no sketch family; SURVEY §2.6 note).

Three classic sketches, each expressed Spark-first so the sketch itself is
built with native aggregates and the big-data side never leaves
whole-stage codegen:

* Bloom-filter join pruning (`bloom_semi_join`) — the runtime-filter
  pattern: a bounded-size bit array built from the small side with
  `bit_or`, shipped as ONE broadcast row, pruning the big side BEFORE any
  shuffle, followed by an exact verify join so results carry no false
  positives. At 100 TB this is the difference between shuffling the whole
  fact table and shuffling only candidate rows.
* Misra-Gries heavy hitters (`mg_candidates` / `heavy_hitters`) — the
  2-pass exact-top-k-at-scale pattern: a per-task bounded-memory sketch
  (Arrow-batched `mapInPandas`, value_counts does the heavy lifting in C)
  yields a small candidate superset, then one exact re-count over the
  candidates makes the answer exact. The full-token groupBy never happens.
* Deterministic HyperLogLog registers (`hll_registers`) — per-group
  distinct-count registers from the engine-wide md5 h60 hash (pure JVM
  expressions, exact integers, so the register table is bit-exactly
  reproducible in any engine with md5).

All numeric outputs are integers; cross-engine value oracles live in
__spark_entry__.py.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60


# ---------------------------------------------------------------------------
# Bloom-filter join pruning
# ---------------------------------------------------------------------------

def _bloom_positions(key_col, m_bits: int, k: int):
    """k probe positions via double hashing: pos_i = (h1 + i*h2) mod m.
    h2 is forced odd so the probe sequence cycles the full table when
    m_bits is a power of two.

    Hashes are native xxhash64 (one JVM intrinsic per row), NOT the
    engine's cross-engine h60 (md5-on-string, ~10x slower): the bloom
    sits BELOW an exact verify join, so false positives never reach the
    output and no oracle ever needs to reproduce these bits — measured
    9.5 s -> ~1 s on the sf0.1 probe stage. Hashes are masked to 60 bits
    so h1 + (k-1)*h2 cannot overflow bigint under ANSI mode."""
    mask = F.lit((1 << 60) - 1).cast("bigint")
    h1 = F.xxhash64(F.lit("b0"), key_col).bitwiseAND(mask)
    h2 = (
        F.xxhash64(F.lit("b1"), key_col)
        .bitwiseAND(mask)
        .bitwiseOR(F.lit(1).cast("bigint"))
    )
    return [((h1 + F.lit(i).cast("bigint") * h2) % m_bits) for i in range(k)]


def _bit(pos):
    """bigint with bit (pos % 64) set — shiftleft via call_function since
    the Python wrapper only accepts a literal shift amount."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
    )


def build_bloom(keys: DataFrame, key: str, m_bits: int = 1 << 16,
                k: int = 3) -> DataFrame:
    """Aggregate the key set into ONE row holding the dense bloom word
    array (`array<bigint>` of m_bits/64 words).

    Scale posture: the word table is built with a native `bit_or` hash
    aggregate (map-side partial agg applies), then densified into a single
    array row with `map_from_entries` + `transform(sequence(...))` — no
    driver collect at any size. The one row is broadcast to the probe side.
    m_bits is a fixed budget chosen for the expected key count (fpr ≈
    (1 - e^{-k·n/m})^k); 2^16 bits = 8 KiB covers ~10^4 keys at k=3 with
    fpr < 1e-3, 2^24 = 2 MiB covers ~10^6.
    """
    n_words = m_bits // 64
    words = _bloom_words_sparse(keys, key, m_bits, k)
    # densify caveat: map element_at is a LINEAR scan, so this transform
    # is O(n_words * occupied) evaluated in ONE row — fine at the 8 KiB
    # default (1024 words), ~20 s at 2^20 bits. Large blooms go through
    # bloom_semi_join, which collects the SPARSE rows and densifies
    # driver-side instead.
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.col("wm")[i.cast("bigint")], F.lit(0).cast("bigint")),
        ).alias("bloom_words")
    )


def _bloom_words_sparse(keys: DataFrame, key: str, m_bits: int, k: int) -> DataFrame:
    """(w, bits) rows for occupied bloom words — one partial-aggregatable
    bit_or hash aggregate, at most m_bits/64 rows."""
    pos = F.explode(F.array(*_bloom_positions(F.col(key), m_bits, k))).alias("pos")
    return (
        keys.select(pos)
        .select(F.shiftright(F.col("pos"), 6).alias("w"),
                _bit(F.col("pos")).alias("b"))
        .groupBy("w").agg(F.bit_or("b").alias("bits"))
    )


def bloom_member(col, m_bits: int = 1 << 16, k: int = 3):
    """Membership predicate against a `bloom_words` column (from
    build_bloom, in scope via a one-row broadcast cross join): k
    element_at + bitwise-AND tests, pure whole-stage-codegen. Kept for
    wiring tests; production probing goes through the BINARY-literal form
    (bloom_member_blob) — the cross-joined row carries the full word
    array through every probe row (128 KiB/row at m_bits = 2^20,
    measured 27 s on sf0.1 lineitem vs 1.3 s for the blob literal)."""
    hit = None
    for p in _bloom_positions(col, m_bits, k):
        word = F.element_at(
            F.col("bloom_words"), (F.shiftright(p, 6) + 1).cast("int")
        )
        test = word.bitwiseAND(_bit(p)) != 0
        hit = test if hit is None else (hit & test)
    return hit


def pack_bloom_blob(words64) -> bytearray:
    """Bloom words -> byte blob of big-endian 4-byte groups, group i
    holding bit positions 32i..32i+31 (bit j of group = 1 << j)."""
    parts = []
    for w in words64:
        u = w & 0xFFFFFFFFFFFFFFFF
        parts.append(struct.pack(">I", u & 0xFFFFFFFF))
        parts.append(struct.pack(">I", u >> 32))
    return bytearray(b"".join(parts))


def bloom_member_blob(col, blob: bytearray, m_bits: int = 1 << 16, k: int = 3):
    """Membership predicate with the word table embedded as ONE binary
    Literal: per probe, an 8-hex-char substring fetch + conv + bitwise
    AND — all codegen, no join, pushes to the scan stage.

    Why binary and not an array literal: `F.lit(list)` builds a
    CreateArray expression with m_bits/64 children that is re-evaluated
    PER ROW (measured 11 s on sf0.1 lineitem at m_bits = 2^20); a binary
    Literal is a true constant (1.3 s). 4-byte groups keep conv()'s
    output within bigint range under ANSI mode (8-byte words with the
    top bit set would overflow the cast)."""
    lit = F.lit(blob)
    hit = None
    for p in _bloom_positions(col, m_bits, k):
        off = (F.shiftright(p, 5) * 4 + 1).cast("int")
        word = F.conv(F.hex(F.substring(lit, off, 4)), 16, 10).cast("bigint")
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (p % 32).cast("int")
        )
        test = word.bitwiseAND(bit) != 0
        hit = test if hit is None else (hit & test)
    return hit


def bloom_semi_join(big: DataFrame, keys: DataFrame, big_key: str,
                    small_key: str, m_bits: int = 1 << 16,
                    k: int = 3, verify: str = "broadcast") -> DataFrame:
    """Exact semi-join of `big` against `keys`, bloom-pruned first.

    Plan shape (the point of the operator):
      1. keys -> bloom word table (one small aggregate, m_bits/8 bytes);
      2. the word table is embedded as a LITERAL in the membership
         predicate (element_at + bitwise AND, whole-stage codegen, no
         join) — the 100 TB side is filtered AT THE SCAN, no shuffle, no
         join network traffic for non-candidates;
      3. surviving candidates (~matching + fpr·|big|) verify against the
         exact key set, so the output has NO false positives.
    The verify join makes the result exactly `big SEMI JOIN keys` — the
    bloom only changes how many rows reach it.

    `verify` picks the exact-join strategy and is the honest part of the
    scale story: with "broadcast" (small key set) Catalyst correctly
    reorders the broadcast semi-join BELOW the bloom test — the bloom is
    then redundant work and this operator only demonstrates wiring. The
    pattern earns its keep with verify="shuffle" (key set too big to
    broadcast): the bloom filter stays below the shuffle exchange, so
    only candidates are hashed across the network — at 100 TB that is the
    difference between shuffling the fact table and shuffling ~the answer.
    Candidate-vs-exact counts and the plan ordering are asserted in
    tests/test_sketch.py.
    """
    # bounded driver materialization (<= m_bits/64 sparse rows — a
    # config-sized constant, NOT data-sized; same class as the IVF
    # centroid literals): collect the occupied words, densify in Python
    # (the JVM transform-over-map densify is a linear-scan trap, ~20 s at
    # 2^20 bits), and embed the table as one binary literal so the
    # membership test is a pure scan-stage filter with no join
    # (measured 27 s -> 1.3 s at m_bits=2^20 on sf0.1 lineitem vs the
    # one-row cross-join form).
    dense = [0] * (m_bits // 64)
    for r in _bloom_words_sparse(keys, small_key, m_bits, k).collect():
        dense[r["w"]] = r["bits"]
    candidates = big.where(
        bloom_member_blob(F.col(big_key), pack_bloom_blob(dense), m_bits, k)
    )
    exact_keys = keys.select(F.col(small_key).alias(big_key)).distinct()
    if verify == "broadcast":
        exact_keys = F.broadcast(exact_keys)
    else:
        # Optimizer barrier (same idiom as knn.py's round checkpoints):
        # without it, PushDownLeftSemiAntiJoin sinks the verify join below
        # the bloom test, shuffling the FULL big side — the exact plan the
        # bloom exists to avoid. The lazy localCheckpoint pins the order:
        # scan -> bloom prune -> materialize candidates (answer-sized)
        # -> shuffle only candidates into the verify join. Verified by
        # tests/test_sketch.py::test_bloom_shuffle_plan_order.
        candidates = candidates.localCheckpoint(eager=False)
        exact_keys = exact_keys.hint("shuffle_hash")
    return candidates.join(exact_keys, on=big_key, how="left_semi")


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (2-pass exact top-k)
# ---------------------------------------------------------------------------

def mg_candidates(items: DataFrame, col: str, capacity: int = 4096) -> DataFrame:
    """Per-task Misra-Gries summaries -> (item, lb) candidate rows.

    Batched MG: merge each Arrow batch's value_counts into a running dict;
    when the dict exceeds `capacity`, subtract the (capacity+1)-th largest
    count from everything and drop non-positives (each such round removes
    ≥ (capacity+1)·t mass, so the total undercount per task is ≤
    n_task/(capacity+1)). Guarantee: any item with true global count
    > N/(capacity+1) survives in at least one task's summary, so the union
    of summaries is a superset of every such item. Memory is O(capacity)
    per task regardless of input size — this is what replaces a full
    groupBy over 100 TB of tokens.
    """
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for item, c in vc.items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > capacity:
                t = sorted(counts.values(), reverse=True)[capacity]
                counts = {i: c - t for i, c in counts.items() if c > t}
        yield pd.DataFrame(
            {"item": list(counts.keys()), "lb": list(counts.values())}
        )

    return items.select(F.col(col).alias(col)).mapInPandas(
        summarize, schema="item string, lb long"
    )


def heavy_hitters(items: DataFrame, col: str, top_k: int = 20,
                  capacity: int = 4096) -> DataFrame:
    """Exact top-k frequent items via MG candidates + one exact re-count.

    Pass 1 shrinks the domain to ≤ capacity·n_tasks candidates; pass 2
    broadcast-semi-joins the stream to the candidates and counts exactly —
    only candidate rows enter the (small) hash aggregate. Exactness
    condition (k-th count > N/(capacity+1)) is asserted in tests; the
    deterministic tie-break is (count DESC, item ASC).
    """
    cands = mg_candidates(items, col, capacity=capacity).select(
        F.col("item").alias(col)
    ).distinct()
    exact = (
        items.join(F.broadcast(cands), on=col, how="left_semi")
        .groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.orderBy(F.desc("cnt"), F.asc(col)).limit(top_k)


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog registers
# ---------------------------------------------------------------------------

def hll_registers(df: DataFrame, group: str, value: str, p: int = 8) -> DataFrame:
    """Per-group HLL registers over the engine h60 hash: bucket = low p
    bits, rho = leading-zero count of the remaining (60-p) bits + 1,
    register = max(rho). Pure JVM integer expressions (bin() gives the MSB
    position exactly — no float log), one map-side-combinable max
    aggregate; 2^p rows per group. The float estimate is intentionally NOT
    computed here (summation order varies across engines); estimator
    accuracy is pinned in tests/test_sketch.py against exact distinct.
    """
    rem_bits = 60 - p
    h = h60(F.concat(F.lit("hll:"), F.col(value).cast("string")))
    bucket = (h % (1 << p)).alias("bucket")
    rem = F.shiftright(h, p)
    rho = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.bin(rem))
    ).cast("int")
    return (
        df.select(F.col(group), bucket, rho.alias("rho"))
        .groupBy(group, "bucket").agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: pd.DataFrame, p: int = 8) -> float:
    """Driver-side HLL estimate from a collected register frame
    (columns bucket, max_rho) — test/reporting helper, not a query path."""
    m = 1 << p
    regs = [0] * m
    for _, r in registers.iterrows():
        regs[int(r["bucket"])] = int(r["max_rho"])
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if raw <= 2.5 * m and zeros:
        import math
        return m * math.log(m / zeros)
    return raw


def count_min_cells(
    df: DataFrame, key_col: str, d: int = 4, w: int = 64
) -> DataFrame:
    """Build a Count-Min sketch (Cormode & Muthukrishnan 2005): d hash
    rows x w counters, cell (r, c) = number of input rows whose key hashes
    to column c under row-r's hash h60('cm' r '_' key) % w.

    The build is the ideal distributed-aggregation shape: a d-way explode
    of slim (key, r) rows into ONE partially-aggregating hash aggregate
    over d*w cells — map-side combine collapses every task's contribution
    to at most d*w rows regardless of input size, which is the entire
    point of a sketch at 100 TB. All integers, engine-reproducible."""
    rows = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    )
    c = h60(
        F.concat(F.lit("cm"), F.col("r").cast("string"), F.lit("_"), F.col("k"))
    ) % w
    return (
        rows.select("r", c.alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def count_min_estimate(
    df: DataFrame, probes: DataFrame, key_col: str, d: int = 4, w: int = 64
) -> DataFrame:
    """Point-frequency estimates from the Count-Min sketch for a probe
    key set: estimate(k) = min over rows r of cell(r, h_r(k)) — the
    classic one-sided guarantee estimate >= true count (collisions only
    ever ADD). Probes landing in an untouched cell read 0.

    The sketch (<= d*w rows) is broadcast to the probe side; the big
    side is touched only by the build aggregate."""
    sk = count_min_cells(df, key_col, d, w)
    pr = probes.select(
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    )
    c = h60(
        F.concat(F.lit("cm"), F.col("r").cast("string"), F.lit("_"), F.col("k"))
    ) % w
    return (
        pr.select("k", "r", c.alias("c"))
        .join(F.broadcast(sk), ["r", "c"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cm_est"))
    )


def hll_merge(registers: DataFrame, group: Column, alias: str) -> DataFrame:
    """Merge HLL register sets upward along any grouping (the sketch's
    defining property: register max is associative/commutative, so
    sketches re-aggregate losslessly along a hierarchy — tile pyramids,
    time windows, source -> domain rollups). One partial-aggregating max;
    the driver query's oracle computes the COARSE level directly from the
    raw data, so a green row PROVES the merge law, not just the
    arithmetic."""
    return (
        registers.groupBy(group.alias(alias), "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )


# ---------------------------------------------------------------------------
# HyperBall: hop-neighborhood cardinality sketches (Boldi & Vigna 2013)
# ---------------------------------------------------------------------------

def hyperball(
    edges: DataFrame,
    nodes: DataFrame,
    hops: int = 3,
    p: int = 4,
    src: str = "u",
    dst: str = "v",
    node: str = "node",
) -> DataFrame:
    """Per-node ball-of-radius-t HLL registers for t = 0..hops.

    HyperBall (Boldi & Vigna, "In-core computation of geometric
    centralities with HyperBall", 2013) computes the neighborhood
    function — |{v : dist(u,v) <= t}| for every u and t — by propagating
    an HLL counter per node along edges and taking register-wise max each
    round; it is how effective-diameter / closeness statistics are
    computed on web-scale graphs where exact balls are quadratic.

    This implementation keeps the counters SPARSE and RELATIONAL: the
    state is rows (node, bucket, max_rho) — absent buckets are zero —
    so a round is one equi-join (edges x state on the neighbor) + one
    map-side-combinable max aggregate, the same shape as the engine's
    other fixpoint loops (cc.py, routing.py), with a localCheckpoint
    lineage barrier per round. Registers reuse the engine h60 derivation
    (hll_registers): bucket = low p bits, rho = leading zeros of the
    remaining (60-p) bits + 1 — deterministic, no RNG, so a SQL twin
    reproduces every register exactly from the reachable sets.

    Returns (node, hop, reg_sum, occ): the integer register sum and the
    occupied-bucket count per node per radius — the float HLL estimate is
    deliberately left to callers (summation-order-safe integers only; the
    hll_estimate helper turns a register frame into the cardinality).

    Scale: state is at most n * 2^p rows (64-bit each side), rounds are
    `hops` (the published use runs to the effective diameter, ~O(log n)
    on web graphs); the join shuffles state by node id each round —
    co-partition edges and state on the node key to make it map-side
    after the first round.
    """
    rem_bits = 60 - p
    h = h60(F.concat(F.lit("hll:"), F.col(node).cast("string")))
    rho = F.when(F.shiftright(h, p) == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.bin(F.shiftright(h, p)))
    ).cast("int")
    state = nodes.select(
        F.col(node).alias("node"),
        (h % (1 << p)).alias("bucket"),
        rho.alias("max_rho"),
    ).localCheckpoint(eager=True)

    sym = (
        edges.select(F.col(src).alias("eu"), F.col(dst).alias("ev"))
        .filter(F.col("eu") != F.col("ev"))
        .unionByName(
            edges.select(F.col(dst).alias("eu"), F.col(src).alias("ev")).filter(
                F.col(src) != F.col(dst)
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def summary(st: DataFrame, t: int) -> DataFrame:
        return st.groupBy("node").agg(
            F.sum("max_rho").cast("bigint").alias("reg_sum"),
            F.count(F.lit(1)).cast("bigint").alias("occ"),
        ).select("node", F.lit(t).cast("bigint").alias("hop"), "reg_sum", "occ")

    out = summary(state, 0)
    for t in range(1, hops + 1):
        from_nbrs = (
            sym.join(state, state["node"] == sym["ev"])
            .select(F.col("eu").alias("node"), "bucket", "max_rho")
        )
        state = (
            state.unionByName(from_nbrs)
            .groupBy("node", "bucket")
            .agg(F.max("max_rho").alias("max_rho"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(summary(state, t))
    return out


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketches with set-overlap estimation
# ---------------------------------------------------------------------------

def kmv_sketch(df: DataFrame, group: str, value: str, k: int = 32) -> DataFrame:
    """Per-group KMV sketch: the k smallest DISTINCT h60 hash values of
    the group's value set (Bar-Yossef et al. 2002; the theta-sketch
    core). Deterministic — same engine hash as hll_registers, no RNG —
    so the sketch rows themselves are value-comparable across engines.

    Returns (group, hv, r): hash value + its rank (1-based, ties
    impossible on distinct values). The k-th value estimates distinct
    cardinality as (k-1) * 2^60 / hv_k (left to the caller, like
    hll_estimate); unlike HLL, two KMV sketches also support SET
    INTERSECTION estimation (kmv_overlap) — the reason this sketch
    family exists next to the registers.

    Plan: distinct (one partial-agg) -> per-group WindowGroupLimit
    (rank <= k prunes map-side, no full sort materializes).
    """
    h = h60(F.concat(F.lit("kmv:"), F.col(value).cast("string")))
    dedup = df.select(F.col(group), h.alias("hv")).distinct()
    w = Window.partitionBy(group).orderBy(F.col("hv").asc())
    return (
        dedup.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
    )


def kmv_overlap(
    sketch: DataFrame, group: str, k: int = 32
) -> DataFrame:
    """All-pairs overlap estimate between per-group KMV sketches.

    For each unordered group pair (a < b): merge the two sketches, keep
    the k smallest distinct values (the union's KMV sketch), and count
    how many of those k appear in BOTH input sketches. Returns
    (ga, gb, kth_union, inter_k, union_k) — all integers. The standard
    estimators follow driver-side: jaccard ~ inter_k / union_k,
    |A u B| ~ (union_k - 1) * 2^60 / kth_union, |A n B| ~ jaccard * |A u B|.

    Shape: the group list is a tiny dim (one row per group); pairs come
    from a broadcast nested-loop of that dim with itself (rows = G^2/2 —
    for thousands of groups switch to banded pairing), then two
    broadcast equi-joins fan the sketch rows (G*k of them) onto their
    pairs; merge/rank/count are one window + one aggregate on the pair
    key. The full-corpus scan happens ONCE, in kmv_sketch.
    """
    groups_a = sketch.select(F.col(group).alias("ga")).distinct()
    groups_b = sketch.select(F.col(group).alias("gb")).distinct()
    pairs = groups_a.crossJoin(F.broadcast(groups_b)).filter(
        F.col("ga") < F.col("gb")
    )
    sk = sketch.select(F.col(group).alias("g"), "hv")
    side_a = pairs.join(
        F.broadcast(sk).withColumnRenamed("g", "ga"), "ga"
    ).select("ga", "gb", "hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    side_b = pairs.join(
        F.broadcast(sk).withColumnRenamed("g", "gb"), "gb"
    ).select("ga", "gb", "hv", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        side_a.unionByName(side_b)
        .groupBy("ga", "gb", "hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy(F.col("hv").asc())
    topk = merged.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    return topk.groupBy("ga", "gb").agg(
        F.max("hv").alias("kth_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("inter_k"),
        F.count(F.lit(1)).cast("bigint").alias("union_k"),
    )
