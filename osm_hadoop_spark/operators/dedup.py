"""Deduplication operators (engine additions for training-data pipelines).

Four families over `documents(doc_id, text)`:
  - exact:          md5 grouping (hash-groupBy);
  - n-gram Jaccard: blocked self-join + exact set Jaccard on word 3-grams;
  - MinHash + LSH:  m deterministic min-hashes over 3-gram shingles, banded
                    into LSH buckets; bucket-join candidates verified with
                    exact Jaccard;
  - SimHash:        b-bit sign-sum sketch over token hashes; Hamming-near
                    pairs within LSH-banded buckets.

All Spark built-ins (JVM-side); the shared h60 hash (textstats.h60) makes
every sketch bit-identical to the DuckDB oracles. Jaccard thresholds are
rational comparisons (t_num/t_den) on integer set sizes — no float drift.

Scale notes (100 TB posture): exact dedup is one hash aggregate; MinHash
LSH is the linear-candidate path (band buckets bound pair blowup; hot
buckets are capped by `bucket_cap` exactly like salting a skewed key);
the blocked-Jaccard family is for small/medium corpora or post-LSH verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60, tokens_col


def exact_clusters(documents: DataFrame) -> DataFrame:
    """Exact duplicate clusters: (text_md5, n_docs, rep_doc = min doc_id)."""
    return (
        documents.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("rep_doc"))
    )


def shingles_col(k: int = 3) -> Column:
    """Distinct word k-gram h60 shingles of `text` (sorted for determinism)."""
    toks = tokens_col()
    n = F.size(toks)
    grams = F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: h60(F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)])),
    )).otherwise(F.array().cast("array<bigint>"))
    return F.array_sort(F.array_distinct(grams))


def ngram_jaccard_pairs(
    documents: DataFrame, t_num: int = 5, t_den: int = 10, k: int = 3
) -> DataFrame:
    """Near-dup pairs with Jaccard(word-k-gram sets) >= t_num/t_den.

    Blocking: candidate pairs must share the SAME first shingle bucket
    (min shingle hash) — a 1-band MinHash block that keeps the self-join
    linear-ish; exact for any pair with Jaccard >= 1/2 only in expectation,
    so this operator is the 'blocked' family; use minhash_lsh_pairs for
    recall-controlled candidates, or verify_pairs for a given pair list.
    """
    # exchange AFTER the shingle+block projection: both self-join branches
    # then share an identical exchange subtree, so ReuseExchange computes
    # the md5-heavy shingles ONCE (round 1 recomputed them per branch)
    # pre-filter on TOKEN count, not size(sh): `size(sh) > 0` is equivalent
    # to `n_tokens >= k`, but a filter on the shingle array gets pushed below
    # the spread exchange and re-evaluates the whole md5-heavy expression
    # serially on the raw scan (measured 5x the query time at sf0.1); the
    # token-count form costs one split() and pushes all the way to the scan
    # coalesce makes `block` NON-nullable (sh is never empty after the
    # pre-filter, so semantics are unchanged): otherwise the self-join infers
    # an isnotnull(block) constraint that re-expands the whole shingle
    # expression and pushes it below the exchange into the serial scan
    blocked = (
        _spread(documents.filter(F.size(tokens_col()) >= k))
        .select(F.col("doc_id"), shingles_col(k).alias("sh"))
        .repartition(documents.sparkSession.sparkContext.defaultParallelism)
        .withColumn("block", F.coalesce(F.element_at("sh", 1), F.lit(-1)))
    )
    a = blocked.select(F.col("block"), F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = blocked.select(F.col("block"), F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    # each doc carries exactly one block, so (doc_a, doc_b) pairs from the
    # block equi-join are already unique — no dedupe shuffle needed
    pairs = a.join(b, ["block"]).filter(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b",
        F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
        F.size(F.array_union("sh_a", "sh_b")).alias("uni"),
    )
    return pairs.filter(F.col("inter") * t_den >= F.col("uni") * t_num).select(
        "doc_a", "doc_b", "inter", "uni"
    )


MINHASH_P = (1 << 31) - 1  # Mersenne prime: a*(s%P) < 2^62 stays in int64


def minhash_params(m: int) -> list[tuple[int, int]]:
    """Deterministic per-seed affine coefficients (a_i, b_i) for the
    universal-hash family h_i(s) = (a_i * (s mod P) + b_i) mod P.

    Derived from splitmix64 so Spark plan and DuckDB oracle embed the SAME
    literals. One md5 per shingle total (the h60 base hash); the m seed
    hashes are pure integer arithmetic — this replaced round 1's
    md5-per-shingle-per-seed scheme (8x the md5 work, verdict item 3)."""
    import numpy as np

    from osm_hadoop_spark.sources.fixtures import _mix64

    idx = np.arange(2 * m, dtype=np.uint64)
    bits = _mix64(idx, 9176)
    out = []
    for i in range(m):
        a = int(bits[2 * i] % np.uint64(MINHASH_P - 1)) + 1
        b = int(bits[2 * i + 1] % np.uint64(MINHASH_P))
        out.append((a, b))
    return out


def minhash_col(m: int = 8, k: int = 3) -> Column:
    """array of m min-hash values over the h60 shingle set (affine family)."""
    return minhash_from(shingles_col(k), m)


def minhash_from(sh: Column, m: int = 8) -> Column:
    """minhash array computed from an ALREADY-MATERIALIZED shingle column —
    keep the shingle construction behind an exchange (repartition) so
    Catalyst's projection collapse cannot re-inline the md5-heavy shingle
    expression once per hash seed (an 8x blowup measured at sf0.1)."""
    p = F.lit(MINHASH_P)
    return F.array(*[
        F.array_min(F.transform(sh, lambda s: (F.lit(a) * (s % p) + F.lit(b)) % p))
        for a, b in minhash_params(m)
    ])


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's parallelism: the documents table often
    arrives as ONE file/partition; every dedup family is CPU-bound, and the
    exchange doubles as a projection-collapse barrier (see minhash_from)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def minhash_lsh_pairs(
    documents: DataFrame,
    m: int = 8,
    bands: int = 4,
    t_num: int = 5,
    t_den: int = 10,
    k: int = 3,
    bucket_cap: int | None = 1000,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    m hashes split into `bands` bands of m/bands rows; docs sharing any band
    signature become candidates; candidates are verified with exact Jaccard
    >= t_num/t_den. `bucket_cap` drops degenerate buckets larger than the cap
    (the skew guard — a bucket of B docs makes B^2 pairs).
    """
    rows_per_band = m // bands
    # `n_tokens >= k` pre-filter instead of `size(sh) > 0`: equivalent, but
    # stays at the scan rather than being pushed below the exchange where it
    # would re-evaluate the shingle expression serially (see
    # ngram_jaccard_pairs)
    sh_df = (
        _spread(documents.filter(F.size(tokens_col()) >= k))
        .select("doc_id", shingles_col(k).alias("sh"))
        .repartition(documents.sparkSession.sparkContext.defaultParallelism)
        # ^ exchange barrier: prevents projection collapse from re-inlining
        #   the shingle expression into the min-hash consumers (and
        #   ReuseExchange shares it across the candidate-verify branches)
    )
    sigs = sh_df.select("doc_id", "sh", minhash_from(F.col("sh"), m).alias("mh"))
    # band rows carry only (doc_id, bucket) — the heavy shingle arrays stay
    # OUT of the self-join shuffle and are joined back for the (few)
    # surviving candidate pairs only
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.concat_ws(
                    "-", b,
                    # collision-free bucket key (string of the band signature)
                    # so the candidate set is exactly reproducible by the oracle
                    F.concat_ws(",", F.slice("mh", b * rows_per_band + 1, rows_per_band)),
                ),
            )
        ).alias("bucket"),
    )
    if bucket_cap:
        sizes = banded.groupBy("bucket").agg(F.count(F.lit(1)).alias("bn"))
        banded = banded.join(
            sizes.filter(F.col("bn") <= bucket_cap).select("bucket"),
            ["bucket"], "left_semi",
        )
    a = banded.select("bucket", F.col("doc_id").alias("doc_a"))
    b = banded.select("bucket", F.col("doc_id").alias("doc_b"))
    cand = (
        a.join(b, ["bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    pairs = (
        cand.join(sh_df.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh_df.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            F.size(F.array_union("sh_a", "sh_b")).alias("uni"),
        )
    )
    return pairs.filter(F.col("inter") * t_den >= F.col("uni") * t_num)


def simhash_col(bits: int = 16) -> Column:
    """b-bit SimHash over whitespace tokens: bit j set iff
    sum over tokens of (2*bit_j(h60(token)) - 1) >= 0 (ties -> set, since
    the empty-token case is filtered upstream)."""
    return simhash_from_hashes(F.transform(tokens_col(), lambda t: h60(t)), bits)


def simhash_from_hashes(hashes: Column, bits: int = 16) -> Column:
    """SimHash from a pre-computed token-hash array column."""
    # unrolled per-bit expressions (shift amounts must be Python literals;
    # a closure factory, NOT a default arg — pyspark inspects lambda arity)
    def _bit_merge(j: int):
        return lambda acc, h: acc + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1)

    out = F.lit(0).cast("bigint")
    for j in range(bits):
        bit_sum = F.aggregate(hashes, F.lit(0).cast("bigint"), _bit_merge(j))
        out = out.bitwiseOR(
            F.when(bit_sum >= 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        )
    return out


def simhash_pairs(documents: DataFrame, bits: int = 16, max_hamming: int = 2) -> DataFrame:
    """SimHash near-dup pairs: Hamming(simhash_a, simhash_b) <= max_hamming.

    Candidates via banded LSH on (max_hamming+1) disjoint bit slices: a pair
    within Hamming distance max_hamming differs in at most max_hamming bits,
    which can touch at most max_hamming bands, so it agrees EXACTLY on at
    least one band (pigeonhole) — candidate generation has perfect recall,
    and the exact Hamming filter gives perfect precision."""
    nbands = max_hamming + 1
    width = bits // nbands
    # materialize token hashes behind an exchange first: simhash_col embeds
    # the token-hash transform once per BIT, and projection collapse would
    # otherwise recompute the md5s 16x
    # non-empty-text pre-filter (== size(th) > 0, but stays at the scan
    # instead of re-evaluating the token-hash transform below the exchange)
    hashed = (
        _spread(documents.filter(F.length(F.trim(F.col("text"))) > 0))
        .select("doc_id", F.transform(tokens_col(), lambda t: h60(t)).alias("th"))
        .repartition(documents.sparkSession.sparkContext.defaultParallelism)
    )
    sh = hashed.select("doc_id", simhash_from_hashes(F.col("th"), bits).alias("sh"))
    banded = sh.select(
        "doc_id", "sh",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("sh"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
            )
            for b in range(nbands)
        ])).alias("bk"),
    ).select("doc_id", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select("band", "key", F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = banded.select("band", "key", F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    cand = (
        a.join(b, ["band", "key"]).filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b").dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def prefix_jaccard_pairs(
    documents: DataFrame, t_num: int = 3, t_den: int = 10, k: int = 3
) -> DataFrame:
    """EXACT Jaccard(word-k-gram sets) >= t self-join via prefix
    filtering (the PPJoin family, Chaudhuri et al. ICDE'06 / Xiao et al.
    WWW'08) — complete recall, unlike ngram_jaccard_pairs' 1-band block
    or minhash_lsh_pairs' probabilistic buckets.

    Completeness: shingles_col returns each set SORTED by shingle hash —
    one consistent global total order. With prefix length
    p(s) = |s| - ceil(t*|s|) + 1, any pair with J >= t shares its
    SMALLEST common shingle inside both prefixes: the intersection has
    >= ceil(t*|A|) elements, all ordered at-or-after the smallest one,
    so that element sits at position <= |A| - ceil(t*|A|) + 1 = p(A)
    (and symmetrically for B). Candidates = equi-join on exploded
    prefix shingles; verify = the same exact integer cross-multiplied
    overlap test as the other families.

    Plan: the shingle projection is MATERIALIZED once — the three
    consumers (prefix explode, both verify sides) project it
    differently, so ReusedExchange does NOT collapse the md5-heavy
    subtree (measured: warm 4.1 -> 2.3 s at sf0.1 from the checkpoint,
    PARITY session-G audit). The candidate join
    ships only (shingle, doc_id) int pairs; full sets are joined back
    for candidates only (the minhash survivor shape). Prefix length
    shrinks as t grows — at t=0.9 the prefix is ~10% of the set, which
    is what makes this exact join viable at corpus scale.
    """
    docs = (
        _spread(documents.filter(F.size(tokens_col()) >= k))
        .select(F.col("doc_id"), shingles_col(k).alias("sh"))
        .repartition(documents.sparkSession.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    p = F.expr(f"size(sh) - div(size(sh) * {t_num} + {t_den} - 1, {t_den}) + 1")
    pref = docs.select(
        F.col("doc_id"), F.explode(F.slice(F.col("sh"), F.lit(1), p)).alias("tok")
    )
    a = pref.select(F.col("tok"), F.col("doc_id").alias("doc_a"))
    b = pref.select(F.col("tok"), F.col("doc_id").alias("doc_b"))
    cand = (
        a.join(b, ["tok"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    sha = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    shb = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = (
        cand.join(sha, ["doc_a"])
        .join(shb, ["doc_b"])
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            F.size(F.array_union("sh_a", "sh_b")).alias("uni"),
        )
    )
    return pairs.filter(F.col("inter") * t_den >= F.col("uni") * t_num).select(
        "doc_a", "doc_b", "inter", "uni"
    )


def positioned_grams(documents: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, pos, gram) — the h60 hash of every word k-gram of `text`,
    with its 1-based start-token position. The slim long-form relation all
    substring-level dedup reads: one bigint + one int per token, no text.
    """
    toks = tokens_col()
    n = F.size(toks)
    empty = F.array().cast("array<struct<pos:int,gram:bigint>>")
    pg = F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            h60(F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            )).alias("gram"),
        ),
    )).otherwise(empty)
    return (
        documents.select("doc_id", F.explode(pg).alias("pg"))
        .select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    )


def dup_substring_spans(
    documents: DataFrame, k: int = 3, min_docs: int = 2
) -> DataFrame:
    """Exact substring-level dedup (the Lee et al. 2022 'Deduplicating
    Training Data Makes Language Models Better' shape, re-expressed
    relationally): find every token k-gram occurring in >= `min_docs`
    DISTINCT documents, then merge each document's duplicated gram
    positions into maximal duplicated spans [start_tok, end_tok].

    This is substring (position-level) dedup, not the document-level
    families above: the unit of removal is a span inside a document, so a
    boilerplate header shared by thousands of docs is surfaced even when
    every doc is globally unique.

    Plan: the slim text relation is read once (ReuseExchange on the
    spread exchange / InMemoryTableScan when cached); the md5 gram
    projection is evaluated twice — once under the duplicate-gram
    aggregate, once on the join-back side. That recompute is deliberate:
    it is pure whole-stage-codegen CPU, versus materializing a
    tokens-sized (~20 B/token) intermediate to disk at corpus scale. The
    census aggregate is skew-safe (two-phase distinct: partial agg on
    (gram, doc_id) first, so a boilerplate gram never concentrates on one
    task); qualifying grams come back as a BROADCAST to the position
    relation, so no shuffle of the big side at all. The span merge is one
    gaps-and-islands window per document; the final (doc_id, isl)
    aggregate is satisfied by the window's doc_id clustering, so no
    exchange follows it.

    Intra-document repeats do not count toward `min_docs` (count of
    DISTINCT doc_id), but once a gram qualifies, every occurrence in every
    document is merged into spans.
    """
    grams = positioned_grams(_spread(documents), k)
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gram")
    )
    hits = grams.join(dup, ["gram"]).select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("isl", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "isl")
        .agg(
            F.min("pos").cast("bigint").alias("start_tok"),
            (F.max("pos") + (k - 1)).cast("bigint").alias("end_tok"),
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        )
        .drop("isl")
    )


def sorted_neighborhood_pairs(
    documents: DataFrame,
    window: int = 4,
    k: int = 3,
    min_jaccard_pct: int = 50,
) -> DataFrame:
    """Sorted-neighborhood dedup (Hernandez & Stolfo '95): sort the corpus
    by a blocking key, compare each record only to the `window - 1`
    records that FOLLOW it in sort order, keep pairs whose exact shingle
    Jaccard clears the threshold.

    The classic alternative to hash blocking (LSH buckets): where LSH
    recall depends on hash collisions, sorted-neighborhood recall depends
    on near-duplicates sorting near each other — here the blocking key is
    the document's minimum shingle hash then doc_id, so exact duplicates
    and most near-duplicates (which share their smallest shingle with
    probability ~= Jaccard) become sort-adjacent.

    DataFrame(doc_a, doc_b, inter_n, union_n) with
    inter_n * 100 >= min_jaccard_pct * union_n (exact integer gate,
    cross-engine safe).

    Plan: ONE global sort (range exchange) over slim (block_key, doc_id,
    shingles) rows; the neighborhood fan-out is `lead(i)` for
    i in 1..window-1 from the SAME sort — no self-join, no second
    shuffle; the exact verify is codegen array_intersect arithmetic.

    100 TB posture: candidates are exactly (window-1) * n rows — linear,
    skew-free by construction (no hot bucket can explode: the
    neighborhood is fixed-width regardless of key collisions). That
    linearity is the operator's selling point vs LSH at planet scale;
    its recall is probabilistic in exchange, and multi-pass (different
    sort keys per pass) is the standard recall amplifier — run it again
    with a different `pass_salt` shingle ordering and union the pairs.
    """
    # Perf shape (measured at sf0.1, round 3; 19.9 s -> ~1 s):
    #  - _spread first: a small parquet arrives as ONE split, so without
    #    it the md5-heavy shingle build runs serially (10.6 s of the
    #    original 19.9 s — the 1-split amplification trap);
    #  - NO size(sh) > 0 filter here: a Filter next to the projection
    #    re-inlines the whole shingle HOF (FilterExec and ProjectExec
    #    don't share subexpressions) and the re-evaluation runs
    #    interpreted — measured 0.2 s -> 10 s for the SAME rows, and the
    #    filter pushes straight back through any repartition placed as a
    #    barrier. Empty-shingle docs instead flow through with a NULL
    #    blocking key: they land in their own NULL strip, can only pair
    #    with each other, and every such pair has union_n = 0 — killed by
    #    the union_n > 0 term of the final gate. Same output, one
    #    evaluation of the shingle expression per row, codegen intact.
    base = _spread(documents).select(
        F.col("doc_id"), shingles_col(k).alias("sh")
    )
    # Distributed form: the sort runs inside 2^10 "strips" (high bits of
    # the blocking key), so the window is partitioned — no single-task
    # global sort. Near-duplicates under this key share bk EXACTLY (same
    # min shingle), hence the same strip; only different-but-adjacent-bk
    # pairs can straddle a strip edge, and those are non-candidates for
    # this key anyway. The strip id is content-derived, so the DuckDB
    # twin partitions identically.
    keyed = base.select(
        F.element_at("sh", 1).alias("bk"), "doc_id", "sh"
    ).withColumn("strip", F.expr("bk >> 50"))
    w = Window.partitionBy("strip").orderBy("bk", "doc_id")
    neigh = keyed.select(
        "doc_id",
        "sh",
        F.array(
            *[
                F.lead(F.struct("doc_id", "sh"), i).over(w).alias(f"_l{i}")
                for i in range(1, window)
            ]
        ).alias("_nbrs"),
    )
    cand = neigh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.explode(F.expr("filter(_nbrs, x -> x IS NOT NULL)")).alias("_b"),
    ).select(
        "doc_a",
        F.col("_b.doc_id").alias("doc_b"),
        F.size(F.array_intersect("sh_a", F.col("_b.sh"))).alias("inter_n"),
        F.size(F.array_union("sh_a", F.col("_b.sh"))).alias("union_n"),
    )
    return cand.where(
        (F.col("union_n") > 0)  # kills NULL-strip empty-shingle pairs
        & (F.col("inter_n") * 100 >= F.lit(min_jaccard_pct) * F.col("union_n"))
    ).select(
        "doc_a", "doc_b",
        F.col("inter_n").cast("bigint").alias("inter_n"),
        F.col("union_n").cast("bigint").alias("union_n"),
    )


def containment_pairs(
    documents: DataFrame, t_num: int = 8, t_den: int = 10, k: int = 3
) -> DataFrame:
    """EXACT asymmetric containment join: ordered pairs (a, b) with
    C(a->b) = |sh(a) n sh(b)| / |sh(a)| >= t — the near-dup geometry
    symmetric Jaccard MISSES (a paragraph wholly lifted into a much
    longer document scores tiny Jaccard but containment ~1; the
    Lee et al. 2022 dedup papers treat this as its own class).

    Blocking is the one-sided PPJoin prefix: if |A n B| >= ceil(t|A|),
    the smallest common shingle sits at position <= |A| - ceil(t|A|) + 1
    in A's hash-sorted set (same pigeonhole as prefix_jaccard_pairs) —
    but NOWHERE bounded in B, so the probe side explodes its FULL set
    (that relation is linear — it is just the shingle table). Complete
    recall, no symmetric prefix shortcut exists for containment.

    Plan: same reused shingle projection as the Jaccard/minhash family;
    candidates ship (shingle, doc) int pairs; full sets join back for
    candidates only; verify = exact integer cross-multiplication
    inter * t_den >= |A| * t_num. The documented 100 TB hazard is a
    STOP-SHINGLE hub (one shingle in everything) exploding the
    candidate join — the standard mitigation (as in minhash bucket_cap)
    is dropping shingles above a document-frequency cap, which cannot
    lose pairs whose OTHER common shingles still collide in the prefix.
    """
    # FOUR consumers read the shingle frame (prefix explode, full
    # explode, both verify sides) with different projections, so
    # ReusedExchange never fires and the md5-heavy build ran 4x —
    # materialize it once (measured 11.9 -> ~7 s at sf0.1, PARITY
    # session-G audit).
    docs = (
        _spread(documents.filter(F.size(tokens_col()) >= k))
        .select(F.col("doc_id"), shingles_col(k).alias("sh"))
        .repartition(documents.sparkSession.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    p = F.expr(f"size(sh) - div(size(sh) * {t_num} + {t_den} - 1, {t_den}) + 1")
    pref = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.explode(F.slice(F.col("sh"), F.lit(1), p)).alias("tok"),
    )
    full = docs.select(
        F.col("doc_id").alias("doc_b"), F.explode(F.col("sh")).alias("tok")
    )
    cand = (
        pref.join(full, ["tok"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    sha = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    shb = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = (
        cand.join(sha, ["doc_a"])
        .join(shb, ["doc_b"])
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint").alias("inter"),
            F.size("sh_a").cast("bigint").alias("n_a"),
        )
    )
    return pairs.filter(
        F.col("inter") * t_den >= F.col("n_a") * t_num
    ).select("doc_a", "doc_b", "inter", "n_a")
