"""Triangle enumeration over an undirected graph — degree-ordered join.

The reference extracts graph-shaped data (way topology) but computes no
graph metrics; triangle counting is the canonical "is my join strategy
scalable" graph kernel (clustering coefficient, community detection,
spam/bot detection all start here). The naive wedge join explodes on hub
nodes: a degree-d node contributes d^2 wedge candidates. The classic fix
(Schank & Wagner 2005; also the standard Spark/GraphX formulation) is
DEGREE ORIENTATION: direct every edge from its lower-(degree, id)
endpoint to the higher one. Every node's OUT-degree is then at most
O(sqrt(m)), so the wedge relation is bounded by sum(out_deg^2) <= m^1.5
regardless of skew — a hub of degree 1M contributes almost nothing
because nearly all its edges point INTO it.

Plan shape (all JVM, three shuffles total):
  1. canonicalize + distinct the edge set;
  2. degree = one hash agg; join degrees back (broadcastable when the
     node count is small, hash join otherwise — AQE decides);
  3. wedges = oriented self-join on the source node, each unordered
     out-neighbor pair emitted ONCE via the lexicographic rank filter;
  4. closing check = semi-join of (b, c) wedge legs against the oriented
     edge set — because rank(b) < rank(c), the closing edge {b, c}, if
     present, is oriented exactly b -> c, so one equi-join suffices.

Each triangle is emitted exactly once (from its minimum-rank corner);
output ids are re-sorted ascending so the result is orientation-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangles(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Enumerate every triangle {x, y, z} of the undirected graph.

    edges: (src, dst) — direction, duplicates and self-loops ignored.
    Returns DataFrame(x, y, z) with x < y < z (node ids ascending), one
    row per triangle.
    """
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
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked = (
        canon.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
        .select(
            F.when(
                F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b")),
                F.struct(
                    F.col("a").alias("s"),
                    F.col("b").alias("t"),
                    F.col("db").alias("dt"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("s"),
                    F.col("a").alias("t"),
                    F.col("da").alias("dt"),
                )
            )
            .alias("e")
        )
        .select("e.s", "e.t", "e.dt")
    )
    e1 = ranked.select(F.col("s"), F.col("t").alias("t1"), F.col("dt").alias("d1"))
    e2 = ranked.select(F.col("s"), F.col("t").alias("t2"), F.col("dt").alias("d2"))
    wedges = e1.join(e2, "s").filter(
        F.struct(F.col("d1"), F.col("t1")) < F.struct(F.col("d2"), F.col("t2"))
    )
    closed = wedges.join(
        ranked.select(F.col("s").alias("t1"), F.col("t").alias("t2")),
        ["t1", "t2"],
        "semi",
    )
    ids = F.array_sort(F.array("s", "t1", "t2"))
    return closed.select(
        ids[0].alias("x"), ids[1].alias("y"), ids[2].alias("z")
    )


def clustering_coefficients(
    edges: DataFrame, src: str = "u", dst: str = "v", scale: int = 1024
) -> DataFrame:
    """Local clustering coefficient per node, exact fixed-point.

    cc(u) = triangles through u / C(deg(u), 2), reported as the integer
    floor of scale * cc (plus the raw tri/deg counters so the rational is
    recoverable) — floats would hash-differ across engines. Nodes of
    degree < 2 are excluded (C(d,2) = 0, the coefficient is undefined).

    Plan: triangle enumeration reuses the degree-ordered join above
    (sum(out_deg^2) <= m^1.5 bound); per-node counts are one explode of
    the triangle corners + a hash agg; the degree frame is the same
    aggregate the orientation already needs. Everything JVM, partial-agg
    friendly. The oracle twin in __spark_entry__.py recounts triangles
    through the textbook 3-way equi-join — a different enumeration
    mechanism over the same graph.
    """
    canon = (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("u"))
        .unionByName(canon.select(F.col("b").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    tri_n = (
        triangles(canon, "a", "b")
        .select(F.explode(F.array("x", "y", "z")).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tri"))
    )
    d = F.col("deg")
    tri = F.coalesce(F.col("tri"), F.lit(0)).cast("bigint")
    return (
        deg.filter(d >= 2)
        .join(tri_n, "u", "left")
        .select(
            "u",
            d.alias("deg"),
            tri.alias("tri"),
            F.expr(f"div(coalesce(tri, 0) * 2 * {int(scale)}, deg * (deg - 1))")
            .cast("bigint")
            .alias("cc_q"),
        )
    )


def four_cliques(
    edges: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Enumerate every 4-clique {w, x, y, z} — the k = 4 step of
    Chiba-Nishizeki / kClist listing, built on the SAME degree
    orientation as triangles(): with vertices ranked by (degree, id),
    all six edges of a 4-clique point rank-upward, so each clique is
    emitted exactly once from its minimum-rank corner s as an ordered
    out-neighbor triple (t1 < t2 < t3 in (deg, id) order) whose three
    closing edges t1->t2, t1->t3, t2->t3 all exist.

    Cost inherits the orientation bound: out-degrees are O(sqrt(m)), so
    the ordered-triple relation is bounded by sum(out_deg^3 / 6) —
    the standard arboricity-style bound that keeps hubs harmless — and
    every closing check is one equi-semi-join on the oriented edge set.

    Returns DataFrame(w, x, y, z) with w < x < y < z (node ids), one
    row per clique.
    """
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
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked = (
        canon.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
        .select(
            F.when(
                F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b")),
                F.struct(
                    F.col("a").alias("s"),
                    F.col("b").alias("t"),
                    F.col("db").alias("dt"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("s"),
                    F.col("a").alias("t"),
                    F.col("da").alias("dt"),
                )
            )
            .alias("e")
        )
        .select("e.s", "e.t", "e.dt")
    )
    e1 = ranked.select("s", F.col("t").alias("t1"), F.col("dt").alias("d1"))
    e2 = ranked.select("s", F.col("t").alias("t2"), F.col("dt").alias("d2"))
    e3 = ranked.select("s", F.col("t").alias("t3"), F.col("dt").alias("d3"))
    trip = (
        e1.join(e2, "s")
        .filter(F.struct(F.col("d1"), F.col("t1"))
                < F.struct(F.col("d2"), F.col("t2")))
        .join(e3, "s")
        .filter(F.struct(F.col("d2"), F.col("t2"))
                < F.struct(F.col("d3"), F.col("t3")))
    )
    oe = lambda la, lb: ranked.select(  # noqa: E731
        F.col("s").alias(la), F.col("t").alias(lb)
    )
    closed = (
        trip.join(oe("t1", "t2"), ["t1", "t2"], "semi")
        .join(oe("t1", "t3"), ["t1", "t3"], "semi")
        .join(oe("t2", "t3"), ["t2", "t3"], "semi")
    )
    ids = F.array_sort(F.array("s", "t1", "t2", "t3"))
    return closed.select(
        ids[0].alias("w"), ids[1].alias("x"),
        ids[2].alias("y"), ids[3].alias("z"),
    )
