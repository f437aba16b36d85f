"""Market-basket association mining: pair support + exact-integer lift.

The transactional co-occurrence family (Agrawal-Srikant association
rules), distinct from the token-level PMI query: baskets are DISTINCT
(order, item) rows, candidate pairs come from a basket self-join, and
the interestingness measure is lift = N * c_ab / (c_a * c_b), reported
as the exact integer numerator/denominator pair (the repo's integer-
exactness discipline: no float division in oracled outputs).

Plan shape: dedup to baskets (one hash aggregate), self-join on the
basket key (per-basket item count bounds the blow-up: a basket of k
items yields k(k-2)/2 pairs — TPC-H orders hold <= 7 lines, so the join
output is linear in input), pair-count hash aggregate, then the item
counts come back as a BROADCAST join (item dimension << pairs) and the
single-row basket total joins as a broadcast one-row build (allowlisted
BNLJ, same class as the bm25/PMI corpus totals).

100 TB posture: the only superlinear risk is a MEGA-basket (one key
with millions of items) making the self-join quadratic; the standard
mitigation is a basket-size cap (documented, like the MinHash
bucket_cap) — drop or sample baskets above a bound, since a basket
containing everything carries no association signal anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pair_lift(
    rows: DataFrame, basket: str = "l_orderkey", item: str = "l_partkey",
    min_support: int = 3, basket_cap: int | None = None,
) -> DataFrame:
    """(item_a, item_b, c_ab, c_a, c_b, n_baskets, lift_num, lift_den)
    for every item pair co-occurring in >= min_support baskets; lift is
    the exact rational lift_num/lift_den = n*c_ab / (c_a*c_b)."""
    b = rows.select(
        F.col(basket).alias("bk"), F.col(item).alias("it")
    ).distinct()
    if basket_cap is not None:
        sizes = b.groupBy("bk").agg(F.count(F.lit(1)).alias("_sz"))
        b = b.join(
            sizes.filter(F.col("_sz") <= basket_cap).select("bk"), "bk", "semi"
        )
    pairs = (
        b.alias("x")
        .join(b.alias("y"), "bk")
        .filter(F.col("x.it") < F.col("y.it"))
        .select(F.col("x.it").alias("item_a"), F.col("y.it").alias("item_b"))
    )
    cab = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ab")
    )
    itemc = b.groupBy("it").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    n = b.select(
        F.count_distinct(F.col("bk")).cast("bigint").alias("n_baskets")
    )
    out = (
        cab.filter(F.col("c_ab") >= min_support)
        .join(
            F.broadcast(itemc.select(F.col("it").alias("item_a"),
                                     F.col("c").alias("c_a"))),
            "item_a",
        )
        .join(
            F.broadcast(itemc.select(F.col("it").alias("item_b"),
                                     F.col("c").alias("c_b"))),
            "item_b",
        )
        .join(F.broadcast(n))
    )
    return out.select(
        "item_a", "item_b", "c_ab", "c_a", "c_b", "n_baskets",
        (F.col("n_baskets") * F.col("c_ab")).alias("lift_num"),
        (F.col("c_a") * F.col("c_b")).alias("lift_den"),
    )
