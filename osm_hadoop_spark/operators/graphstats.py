"""Degree-structure censuses: assortativity ingredients and the
rich-club ladder — exact global descriptors of a graph's wiring.

The engine's graph family measures local structure (triangles, truss,
clustering) and reachability (bfs, sssp, components); these two are
the standard GLOBAL degree-correlation descriptors next to them:

  - degree assortativity (Newman 2002): does high degree attach to
    high degree?  Pearson r over edge-endpoint degrees — emitted here
    as its exact integer sums (m, Σ d_u d_v, Σ (d_u + d_v),
    Σ (d_u² + d_v²)) so r = (S_xy/m - (S_x/2m)²) / (S_x2/2m -
    (S_x/2m)²) is a presentation-time scalar and the engine output
    hash-matches bit-for-bit.
  - rich-club ladder (Zhou & Mondragon 2004): for each degree
    threshold k, how many nodes exceed it and how many edges run
    between them — φ(k) = 2 e_k / (n_k (n_k - 1)) downstream; a
    rising φ exposes elite cores that assortativity's single scalar
    averages away.

Plan: canonical distinct edge set, one degree aggregate, degrees
joined back to edges (the triangles.py shape), then ONE conditional
aggregate for assortativity and one inline threshold-ladder explode +
aggregate for the rich club.  All int64; overflow bound m * d_max² <
2^63 documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_with_degrees(edges: DataFrame, src: str, dst: str):
    canon = (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("n"))
        .unionByName(canon.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    withd = (
        canon.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")),
                   "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    )
    return withd, deg


def assortativity_sums(
    edges: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """One row (m, s_xy, s_x, s_x2) of exact degree-assortativity
    sums over the canonical undirected edge set."""
    withd, _ = _canon_with_degrees(edges, src, dst)
    da, db = F.col("da"), F.col("db")
    return withd.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(da * db).cast("long").alias("s_xy"),
        F.sum(da + db).cast("long").alias("s_x"),
        F.sum(da * da + db * db).cast("long").alias("s_x2"),
    )


def rich_club_census(
    edges: DataFrame,
    ks: tuple[int, ...],
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """(k, n_nodes, n_edges) per threshold: nodes with degree > k and
    edges whose BOTH endpoints exceed k.  Thresholds with an empty
    club still emit (k, 0, 0)."""
    ks = tuple(sorted(set(int(k) for k in ks)))
    if not ks:
        raise ValueError("ks must be non-empty")
    withd, deg = _canon_with_degrees(edges, src, dst)
    karr = F.array(*[F.lit(k) for k in ks])
    nodes = (
        deg.select(F.explode(karr).alias("k"), "d")
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("d") > F.col("k"), 1).otherwise(0))
            .cast("long").alias("n_nodes")
        )
    )
    eedges = (
        withd.select(F.explode(karr).alias("k"), "da", "db")
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    (F.col("da") > F.col("k")) & (F.col("db") > F.col("k")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_edges")
        )
    )
    return (
        nodes.join(eedges, "k", "left")
        .select(
            F.col("k").cast("bigint").alias("k"),
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0)).cast("long")
            .alias("n_edges"),
        )
    )


def modularity_census(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "u",
    dst: str = "v",
    node: str = "node",
    community: str = "community",
) -> DataFrame:
    """Exact Newman modularity ingredients per community for a GIVEN
    partition — the evaluation half of community detection (label
    propagation proposes, this scores). Per community c over the
    canonical undirected edge set:

        (community, n_nodes, e_in, deg_sum)

    with e_in = edges inside c, deg_sum = Σ degrees of c's nodes; the
    scalar Q = Σ_c [e_in/m - (deg_sum/2m)²] assembles at presentation
    time, and m itself is derivable from the output (Σ deg_sum = 2m),
    so no one-row global cross-join is needed. The node side is driven
    by the LABELS relation, so labeled-but-isolated nodes still count
    (degree 0) and communities touching no edge emit (e_in = 0).

    Plan: two label equi-joins on the edge list + one on the degree
    table, two hash aggregates — all partial-aggregatable, no windows,
    no products. Overflow: deg_sum <= 2m < 2^63.
    """
    withd, deg = _canon_with_degrees(edges, src, dst)
    lab = labels.select(
        F.col(node).alias("n"), F.col(community).alias("c")
    )
    e_in = (
        withd.select("a", "b")
        .join(lab.select(F.col("n").alias("a"), F.col("c").alias("ca")), "a")
        .join(lab.select(F.col("n").alias("b"), F.col("c").alias("cb")), "b")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    nodes = (
        lab.join(deg, "n", "left")  # labeled isolated nodes still count
        .groupBy(F.col("c").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.coalesce("d", F.lit(0))).cast("long").alias("deg_sum"),
        )
    )
    return nodes.join(e_in, "community", "left").select(
        "community", "n_nodes",
        F.coalesce("e_in", F.lit(0)).cast("long").alias("e_in"),
        "deg_sum",
    )


def dyad_census(
    arcs: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Holland-Leinhardt dyad census of a DIRECTED graph: one row
    (n_nodes, n_arcs, mutual, asym, nulls) — the reciprocity
    ingredients (r = 2*mutual/n_arcs is presentation-time) and the
    base of the M-A-N triad hierarchy.

    mutual = unordered pairs with BOTH directions, asym = exactly one,
    nulls = C(n, 2) - mutual - asym (derived against the observed node
    set, the standard convention). Self-loops dropped, parallel arcs
    collapsed.

    Plan: one distinct over arcs, one (least, greatest) pair hash
    aggregate counting directions (1 or 2), two ONE-ROW global
    aggregates stitched with a bounded broadcast nested-loop join (the
    ams_f2 idiom — both build sides are single rows by construction,
    allowlisted in the registry plan audit). Everything upstream is
    partial-aggregatable; nothing data-sized joins anything.
    """
    a = (
        arcs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    pairs = (
        a.groupBy(
            F.least("s", "d").alias("a"), F.greatest("s", "d").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("dirs"))
    )
    nodes = (
        a.select(F.col("s").alias("n"))
        .unionByName(a.select(F.col("d").alias("n")))
        .agg(F.count_distinct("n").cast("long").alias("n_nodes"))
    )
    cens = pairs.agg(
        F.sum("dirs").cast("long").alias("n_arcs"),
        F.sum(F.when(F.col("dirs") == 2, 1).otherwise(0))
        .cast("long").alias("mutual"),
        F.sum(F.when(F.col("dirs") == 1, 1).otherwise(0))
        .cast("long").alias("asym"),
    )
    return (
        nodes.crossJoin(cens)
        .select(
            "n_nodes", "n_arcs", "mutual", "asym",
            (
                F.expr("n_nodes * (n_nodes - 1) DIV 2")  # exact int64
                - F.col("mutual") - F.col("asym")
            ).cast("long").alias("nulls"),
        )
    )


def bipartite_census(
    edges: DataFrame, src: str = "u", dst: str = "v", max_hops: int = 64
) -> DataFrame:
    """Per-component bipartiteness verdict: (component, n_nodes,
    odd_edges) — the graph-QA primitive behind 2-colorability,
    conflict-free scheduling, and signed-network balance. A component
    is bipartite iff odd_edges = 0.

    Mechanism: BFS levels from each component's minimum node (bfs_hops
    reused; its src_id IS the component label, so no separate cc pass),
    then one edge-vs-level equi-join pair: an edge whose endpoints sit
    at EQUAL level parity closes an odd cycle (standard BFS parity
    argument — tree edges always cross parities, and any same-parity
    edge completes an odd closed walk, which contains an odd cycle).
    The census counts them per component; the parity classes themselves
    are the 2-coloring when the count is 0.

    Plan: the bfs_hops frontier rounds (eccentricity-bound, and FAIL-FAST
    on exhaustion — raise_on_exhaustion=True, the bridges.py contract: a
    component whose eccentricity from its min-id node exceeds max_hops
    raises instead of silently dropping unreached endpoints from the
    census) + two equi-joins + one hash aggregate.
    """
    from osm_hadoop_spark.operators.cc import connected_components
    from osm_hadoop_spark.operators.routing import bfs_hops

    e = (
        edges.select(F.least(src, dst).alias("u"),
                     F.greatest(src, dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    comp = connected_components(e, "u", "v")
    roots = comp.filter(F.col("node") == F.col("component")).select(
        F.col("node")
    )
    lv = bfs_hops(e, roots, max_hops=max_hops, raise_on_exhaustion=True).select(
        "node", (F.col("dist") % 2).alias("par"),
        F.col("src_id").alias("component"),
    )
    flagged = (
        e.join(lv.select(F.col("node").alias("u"), F.col("par").alias("pu"),
                         "component"), "u")
        .join(lv.select(F.col("node").alias("v"), F.col("par").alias("pv")),
              "v")
        .groupBy("component")
        .agg(
            F.sum(F.when(F.col("pu") == F.col("pv"), 1).otherwise(0))
            .cast("long").alias("odd_edges")
        )
    )
    nodes = lv.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    return nodes.join(flagged, "component", "left").select(
        "component", "n_nodes",
        F.coalesce("odd_edges", F.lit(0)).cast("long").alias("odd_edges"),
    )


# --- directed triad census (Holland-Leinhardt MAN ladder) -------------------
# 6-bit arc code for the SORTED triple (i < j < k):
#   bit0 i->j, bit1 j->i, bit2 i->k, bit3 k->i, bit4 j->k, bit5 k->j
# The 64 codes collapse to 16 isomorphism classes; the canonical class
# representative is the minimum code over the 6 node permutations, and
# the class names pin the standard MAN census with explicit structural
# suffixes (docstring of triad_census).
_TRIAD_BITS = ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1))

_TRIAD_NAMES = {
    0: "003", 1: "012", 3: "102",
    5: "021D", 6: "021C", 10: "021U",
    7: "111U", 11: "111D",
    21: "030T", 25: "030C",
    15: "201",
    23: "120U", 27: "120C", 30: "120D",
    31: "210", 63: "300",
}


def _triad_map64() -> dict:
    """code6 -> type name for all 64 codes, by min-over-permutations."""
    from itertools import permutations

    def recode(code, perm):
        arcs = set()
        for b, (x, y) in enumerate(_TRIAD_BITS):
            if code >> b & 1:
                arcs.add((perm[x], perm[y]))
        out = 0
        for b, (x, y) in enumerate(_TRIAD_BITS):
            if (x, y) in arcs:
                out |= 1 << b
        return out

    m = {}
    for c in range(64):
        canon = min(recode(c, p) for p in permutations(range(3)))
        m[c] = _TRIAD_NAMES[canon]
    assert len(set(m.values())) == 16
    return m


def triad_census(
    arcs: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Full Holland-Leinhardt TRIAD census of a directed graph: 16 rows
    (triad, n_triads) over every unordered node triple — the canonical
    social-network structure census above dyad_census, computed by the
    Batagelj-Mrvar subtraction scheme: only triples with >= 2 connected
    dyads are ENUMERATED; the single-dyad and empty classes follow in
    closed form from the dyad census and n.

    Type names are the standard MAN codes; the letter suffixes are
    pinned structurally (not by any one library's table):
      021D out-star, 021U in-star, 021C path;
      111U mutual pair sends to third, 111D third sends into pair;
      030T transitive, 030C 3-cycle;
      120U pair sends both arcs to third, 120D third sends both in,
      120C one in one out; 201 two mutual; 210 two mutual + asym;
      300 complete mutual. Each name's exemplar is pinned in pytest.

    Plan: one (lo, hi) dyad-code aggregate, one incidence self-join
    enumerating wedges (cost sum deg_undirected² — the triangles.py
    envelope), three dyad-code lookups per distinct triple, a 64-entry
    literal map to the class name, and one-row closed-form rows for
    003/012/102 stitched by the allowlisted one-row BNLJ (ams_f2/dyad
    idiom). Overflow: C(n,3) < 2^63 to n ~ 3.8M observed nodes —
    beyond that the empty-class count (not the enumeration) needs
    widening.
    """
    a = (
        arcs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dy = (
        a.select(
            F.least("s", "d").alias("lo"), F.greatest("s", "d").alias("hi"),
            F.when(F.col("s") < F.col("d"), 1).otherwise(2).alias("bit"),
        )
        .groupBy("lo", "hi")
        .agg(
            (
                F.max(F.when(F.col("bit") == 1, 1).otherwise(0))
                + 2 * F.max(F.when(F.col("bit") == 2, 1).otherwise(0))
            ).alias("code")
        )
        .localCheckpoint(eager=True)
    )
    inc = dy.select(F.col("lo").alias("c"), F.col("hi").alias("o")).unionByName(
        dy.select(F.col("hi").alias("c"), F.col("lo").alias("o"))
    )
    triples = (
        inc.alias("l")
        .join(inc.alias("r"), "c")
        .filter(F.col("l.o") < F.col("r.o"))
        .select(
            F.array_sort(
                F.array(F.col("c"), F.col("l.o"), F.col("r.o"))
            ).alias("t")
        )
        .distinct()
        .select(
            F.col("t")[0].alias("i"), F.col("t")[1].alias("j"),
            F.col("t")[2].alias("k"),
        )
    )

    def dcode(x, y, alias):
        return dy.select(
            F.col("lo").alias(x), F.col("hi").alias(y),
            F.col("code").alias(alias),
        )

    coded = (
        triples.join(dcode("i", "j", "dij"), ["i", "j"], "left")
        .join(dcode("i", "k", "dik"), ["i", "k"], "left")
        .join(dcode("j", "k", "djk"), ["j", "k"], "left")
        .select(
            F.coalesce("dij", F.lit(0)).alias("dij"),
            F.coalesce("dik", F.lit(0)).alias("dik"),
            F.coalesce("djk", F.lit(0)).alias("djk"),
        )
    )
    m64 = _triad_map64()
    map_items = []
    for c, name in sorted(m64.items()):
        map_items += [F.lit(c), F.lit(name)]
    code6 = F.col("dij") + 4 * F.col("dik") + 16 * F.col("djk")
    lab = coded.select(
        F.create_map(*map_items)[code6].alias("triad"),
        (
            (F.col("dij") == 1).cast("int") + (F.col("dij") == 2).cast("int")
            + (F.col("dik") == 1).cast("int") + (F.col("dik") == 2).cast("int")
            + (F.col("djk") == 1).cast("int") + (F.col("djk") == 2).cast("int")
        ).alias("n_asym"),
        (
            (F.col("dij") == 3).cast("int") + (F.col("dik") == 3).cast("int")
            + (F.col("djk") == 3).cast("int")
        ).alias("n_mut"),
    ).localCheckpoint(eager=True)
    enum = lab.groupBy("triad").agg(
        F.count(F.lit(1)).cast("long").alias("n_triads")
    )
    sums = lab.agg(
        F.count(F.lit(1)).cast("long").alias("t_enum"),
        F.coalesce(F.sum("n_asym"), F.lit(0)).cast("long").alias("a_in"),
        F.coalesce(F.sum("n_mut"), F.lit(0)).cast("long").alias("m_in"),
    )
    dyg = dy.agg(
        F.sum(F.when(F.col("code") != 3, 1).otherwise(0))
        .cast("long").alias("a_dy"),
        F.sum(F.when(F.col("code") == 3, 1).otherwise(0))
        .cast("long").alias("m_dy"),
    )
    nn = (
        a.select(F.col("s").alias("n")).unionByName(
            a.select(F.col("d").alias("n"))
        )
        .agg(F.count_distinct("n").cast("long").alias("n"))
    )
    scalars = nn.crossJoin(dyg).crossJoin(sums).select(
        (F.col("a_dy") * (F.col("n") - 2) - F.col("a_in")).alias("c012"),
        (F.col("m_dy") * (F.col("n") - 2) - F.col("m_in")).alias("c102"),
        (
            F.expr("n * (n - 1) DIV 2 * (n - 2) DIV 3")
            - F.col("t_enum")
            - (F.col("a_dy") * (F.col("n") - 2) - F.col("a_in"))
            - (F.col("m_dy") * (F.col("n") - 2) - F.col("m_in"))
        ).alias("c003"),
    )
    spark = arcs.sparkSession
    frame = spark.createDataFrame(
        [(nm,) for nm in sorted(set(m64.values()))], "triad: string"
    )
    closed = frame.filter(F.col("triad").isin("003", "012", "102")).crossJoin(
        scalars
    ).select(
        "triad",
        F.when(F.col("triad") == "003", F.col("c003"))
        .when(F.col("triad") == "012", F.col("c012"))
        .otherwise(F.col("c102")).cast("long").alias("n_triads"),
    )
    open_frame = (
        frame.filter(~F.col("triad").isin("003", "012", "102"))
        .join(enum, "triad", "left")
        .select(
            "triad",
            F.coalesce("n_triads", F.lit(0)).cast("long").alias("n_triads"),
        )
    )
    return open_frame.unionByName(closed)
