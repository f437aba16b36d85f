"""Text analysis operators for training-data pipelines (engine additions).

The reference has no text ops (its only string work is tag equality, SURVEY
section 2.6); these are the large-scale-pipeline additions the engine is
required to carry: language ID, quality scoring, token counting, document
fingerprinting — all over the flat `documents(doc_id, text, ...)` table.

Every operator is pure Spark built-ins (JVM-side, whole-stage codegen): no
Python in the hot path at all. Each has an exact DuckDB oracle in
__spark_entry__.py; numeric outputs are integers or integer ratios so the
cross-engine comparison is bit-exact.

Shared deterministic 60-bit hash (engine-wide convention, also used by
dedup.py): h60(s) = bigint(first 15 hex chars of md5(s)) — identical in
Spark (`conv(substr(md5(s),1,15),16,10)`) and DuckDB
(`cast('0x' || substr(md5(s),1,15) as bigint)`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# whitespace tokenizer (empty text -> 0 tokens)
_WS = r"\s+"
# BPE-ish pretokenizer: letter runs, digit runs, single other non-space
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "es": ["el", "la", "de", "que", "y", "los", "un", "por"],
}

PUNCT_RE = r"[.,;:!?]"


def h60(col: Column) -> Column:
    """The shared 60-bit md5 hash (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def tokens_col(text: str = "text") -> Column:
    t = F.trim(F.col(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, _WS)
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish subtoken count per document."""
    return documents.select(
        "doc_id",
        F.size(tokens_col()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


def quality_cols() -> dict[str, Column]:
    """The quality feature columns as reusable expressions (so composed
    pipelines can evaluate them in the SAME projection as other features
    instead of joining separate doc_id-keyed frames)."""
    toks = tokens_col()
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_arr = F.array(*[F.lit(w) for w in all_stop])
    return {
        "n_chars_measured": F.length("text"),
        "n_ws_tokens": F.size(toks),
        "n_punct": F.size(F.regexp_extract_all(F.col("text"), F.lit(PUNCT_RE), 0)),
        "n_stop": F.size(
            F.filter(
                F.transform(toks, lambda t: F.lower(t)),
                lambda t: F.array_contains(stop_arr, t),
            )
        ),
    }


def quality_keep_col(c: dict[str, Column] | None = None) -> Column:
    c = c or quality_cols()
    return (
        (c["n_ws_tokens"] >= 5)
        & (100 * c["n_punct"] <= 30 * c["n_ws_tokens"])
        & (100 * c["n_stop"] >= 2 * c["n_ws_tokens"])
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + keep flag.

    Rule (integer-exact): keep iff n_ws_tokens >= 5 AND 100*punct <= 30*tokens
    AND 100*stop_hits >= 2*tokens (some natural-language signal)."""
    c = quality_cols()
    d = documents.select("doc_id", *[v.alias(k) for k, v in c.items()])
    return d.withColumn(
        "keep",
        (F.col("n_ws_tokens") >= 5)
        & (100 * F.col("n_punct") <= 30 * F.col("n_ws_tokens"))
        & (100 * F.col("n_stop") >= 2 * F.col("n_ws_tokens")),
    )


def lang_hits_cols() -> dict[str, Column]:
    """Per-language stopword hit counts as reusable expressions."""
    toks = F.transform(tokens_col(), lambda t: F.lower(t))
    out = {}
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[f"hits_{lang}"] = F.size(
            F.filter(toks, lambda t: F.array_contains(arr, t))
        )
    return out


def pred_lang_col(hits: dict[str, Column] | None = None) -> Column:
    """Argmax language with the deterministic tie-break (hits desc, code
    asc); 'und' when no stopword hits at all."""
    hits = hits or lang_hits_cols()
    best = F.greatest(
        *[
            F.struct(
                hits[f"hits_{k}"].alias("h"),
                F.lit(-ord(k[0]) * 256 - ord(k[1])).alias("o"),
                F.lit(k).alias("lang"),
            )
            for k in STOPWORDS
        ]
    )
    return F.when(best["h"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: stopword-hit argmax with deterministic
    tie-break (hit count desc, then language code asc); 'und' when no hits.

    A deterministic engine RULE (not a model): both the Spark plan and the
    DuckDB oracle compute the identical function of the text."""
    hits = lang_hits_cols()
    return documents.select(
        "doc_id",
        *[hits[f"hits_{k}"].alias(f"hits_{k}") for k in STOPWORDS],
        pred_lang_col(hits).alias("pred_lang"),
    )


def fingerprints(documents: DataFrame, mod: int = 8) -> DataFrame:
    """Document fingerprinting via word-3-gram mod-p selection (winnowing-
    style 0-mod-p sketch): select shingle hashes h60 % mod == 0; emit the
    sketch minimum, size, and the full-text hash."""
    toks = tokens_col()
    n = F.size(toks)
    grams = F.when(n >= 3, F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: h60(F.concat_ws(" ",
                                  F.element_at(toks, i),
                                  F.element_at(toks, i + 1),
                                  F.element_at(toks, i + 2))),
    )).otherwise(F.array().cast("array<bigint>"))
    sel = F.filter(grams, lambda h: h % mod == 0)
    return documents.select(
        "doc_id",
        h60(F.col("text")).alias("text_h60"),
        F.size(sel).alias("n_selected"),
        F.array_min(sel).alias("min_selected"),
    )


def inverted_index(
    documents: DataFrame, min_df: int = 1, shard_bits: int = 0
) -> DataFrame:
    """Build a full-text inverted index: one row per (term, shard) with
    document frequency, corpus term frequency, and a canonical postings
    string "doc:pos,pos;doc:pos,..." ordered by doc_id — the classic
    large-scale indexing workload (and the original MapReduce motivating
    example), expressed as two partial-aggregating hash aggregates.

    Level 1 groups by (term, doc): the collect_list there is bounded by a
    single document's length, so it is always safe. Level 2 groups by
    (term, shard): a stopword term's postings span the whole corpus — the
    one unbounded list in this shape — so `shard_bits` splits each term's
    postings across 2**shard_bits rows keyed by doc_id's low bits, exactly
    how production engines segment hot posting lists. With sharding on,
    no output row (and no single task's collect_list) can exceed
    corpus/2**shard_bits docs; shards of one term land on different
    reducers because the level-2 shuffle key is (term, shard).

    Postings are emitted as a STRING, not nested arrays: the canonical
    form is stable across engines (the DuckDB twin builds the identical
    text), and an index consumer parses it back trivially.
    """
    toks = tokens_col()
    # spread before the explode: the documents table often arrives as ONE
    # file/split, and the md5-per-token build serializes on it (the
    # 1-split amplification trap; measured 3.8 -> 0.8 s warm at sf0.1)
    documents = documents.repartition(
        documents.sparkSession.sparkContext.defaultParallelism
    )
    tp = documents.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks)),
                lambda i: F.struct(
                    i.alias("pos"), h60(F.element_at(toks, i)).alias("term")
                ),
            )
        ).alias("tp"),
    ).select(
        "doc_id", F.col("tp.pos").alias("pos"), F.col("tp.term").alias("term")
    )
    perdoc = (
        tp.groupBy("term", "doc_id")
        .agg(
            F.array_sort(F.collect_list("pos")).alias("ps"),
            F.count(F.lit(1)).alias("tf"),
        )
        .select(
            "term",
            "doc_id",
            F.pmod("doc_id", F.lit(1 << shard_bits)).cast("bigint").alias("shard"),
            "tf",
            F.concat_ws(
                ":", F.col("doc_id"), F.array_join(F.col("ps"), ",")
            ).alias("entry"),
        )
    )
    out = (
        perdoc.groupBy("term", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("ctf"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                    lambda x: x["entry"],
                ),
                ";",
            ).alias("postings"),
        )
    )
    if min_df > 1:
        # df is per-shard; the min_df gate is on the TERM's total df so a
        # sharded hot term is kept or dropped as a unit
        w = Window.partitionBy("term")
        out = out.withColumn("term_df", F.sum("df").over(w)).filter(
            F.col("term_df") >= min_df
        ).drop("term_df")
    return out


def cooccurrence_pairs(
    documents: DataFrame, window: int = 2, min_count: int = 2
) -> DataFrame:
    """Word co-occurrence counts with exact PMI sufficient statistics —
    the word2vec/GloVe preprocessing matrix. For every unordered term
    pair co-occurring within `window` token positions inside a document,
    emit (a, b, n_ab, n_a, n_b, n_tot): PMI = log(n_ab * n_tot / (n_a *
    n_b)) is monotone in the rational n_ab*n_tot/(n_a*n_b), so emitting
    the exact integer statistics instead of the float keeps the output
    engine-reproducible and lets the consumer pick any PMI variant.

    Plan: the big side is the positioned-term stream; pairing is the
    shifted-self EQUI-join (each token exploded to its next `window`
    positions — a bounded linear fan-out), never an inequality join; the
    pair census and unigram census are partial-aggregating hash
    aggregates; n_tot is a 1-row broadcast. Pairs are canonicalized
    (least, greatest) by term hash so each unordered pair counts once per
    occurrence. Same-term-within-window pairs are kept (standard in
    co-occurrence counting; a == b rows have n_a == n_b).
    """
    toks = tokens_col()
    spread = documents.select("doc_id", "text").repartition(
        documents.sparkSession.sparkContext.defaultParallelism
    )
    tp = spread.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks)),
                lambda i: F.struct(
                    i.alias("pos"), h60(F.element_at(toks, i)).alias("term")
                ),
            )
        ).alias("tp"),
    ).select(
        "doc_id", F.col("tp.pos").alias("pos"), F.col("tp.term").alias("term")
    )
    left = tp.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(window)), lambda d: F.col("pos") + d
            )
        ).alias("pos"),
        F.col("term").alias("term_a"),
    )
    pairs = left.join(tp, ["doc_id", "pos"]).select(
        F.least("term_a", "term").alias("a"),
        F.greatest("term_a", "term").alias("b"),
    )
    cnt = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    uni = tp.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # n_tot from the (tiny) unigram census, not a fourth pass over tokens
    tot = uni.agg(F.sum("n").cast("bigint").alias("n_tot"))
    return (
        cnt.join(uni.select(F.col("term").alias("a"), F.col("n").alias("n_a")), "a")
        .join(uni.select(F.col("term").alias("b"), F.col("n").alias("n_b")), "b")
        .crossJoin(F.broadcast(tot))
        .select("a", "b", "n_ab", "n_a", "n_b", "n_tot")
    )


def token_drift_chi2(
    documents: DataFrame,
    slice_pred: Column,
    min_total: int = 5,
    text: str = "text",
) -> DataFrame:
    """Per-token chi-square drift statistics between a corpus slice and its
    complement — the standard test for vocabulary drift / contamination /
    domain shift between training-data slices (keyword chi-square feature
    scoring, Manning & Schütze ch. 5 shape).

    For each token t, the 2x2 contingency table over token OCCURRENCES:
        a = occurrences of t in the slice        b = occurrences outside
        c = other slice tokens (Na - a)          d = other outside tokens
    chi2 = N*(ad - bc)^2 / (ab_tot*(N - ab_tot)*Na*(N - Na)) where
    ab_tot = a + b. The fraction is emitted UNREDUCED as exact decimal
    integer strings (chi2_num, chi2_den) — ranking by the float quotient is
    the consumer's (lossy) choice; the cross-engine value oracle compares
    the exact integers. Spark DECIMAL(38,0) / DuckDB HUGEINT bound the
    intermediate products (documented: |num| < N^3 — at 10^12 tokens switch
    the two count factors to per-shard sums before the final multiply).

    Plan: one token explode -> one map-side-combinable (token, slice)
    aggregate; the two corpus totals come from the tiny per-token census
    (a broadcast single-row cross join), never a second scan.
    """
    toks = tokens_col(text)
    t = documents.select(
        slice_pred.alias("sl"), F.explode(toks).alias("tok")
    ).select("sl", F.lower(F.col("tok")).alias("token"))
    per = t.groupBy("token").agg(
        F.sum(F.when(F.col("sl"), 1).otherwise(0)).cast("bigint").alias("a"),
        F.count(F.lit(1)).cast("bigint").alias("ab_tot"),
    )
    # the census feeds both the totals row and the per-token output; lazy
    # localCheckpoint (the timeseries.py idiom) materializes it once so the
    # corpus scan + explode is not re-executed for the totals branch
    # (pinned by tests/test_token_drift.py's plan audit)
    per = per.localCheckpoint(eager=False)
    tot = per.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("ab_tot").cast("bigint").alias("n"),
    )
    d38 = "decimal(38,0)"
    j = per.crossJoin(F.broadcast(tot))
    b = (F.col("ab_tot") - F.col("a")).alias("b")
    c = (F.col("na") - F.col("a")).alias("c")
    d = (F.col("n") - F.col("na") - F.col("ab_tot") + F.col("a")).alias("d")
    j = j.select("token", "a", "ab_tot", "na", "n", b, c, d)
    delta = (
        F.col("a").cast(d38) * F.col("d").cast(d38)
        - F.col("b").cast(d38) * F.col("c").cast(d38)
    )
    num = (F.col("n").cast(d38) * delta * delta).cast(d38)
    den = (
        F.col("ab_tot").cast(d38)
        * (F.col("n") - F.col("ab_tot")).cast(d38)
        * F.col("na").cast(d38)
        * (F.col("n") - F.col("na")).cast(d38)
    ).cast(d38)
    return (
        j.filter(F.col("ab_tot") >= min_total)
        .select(
            "token",
            "a",
            b,
            num.cast("string").alias("chi2_num"),
            den.cast("string").alias("chi2_den"),
        )
    )


def vocab_growth(documents: DataFrame, step: int = 100,
                 text: str = "text", ngram: int = 1) -> DataFrame:
    """Vocabulary growth curve (Heaps'-law audit): distinct-n-gram count
    among the first k documents, for k at every `step` boundary — the
    standard corpus-health diagnostic (a growth curve that flattens too
    early signals template spam; one that never flattens signals noise/
    encoding damage). `ngram` > 1 tracks token n-grams (space-joined),
    whose vocabulary is far larger and saturates far later — the curve
    a real corpus audit actually plots.

    Shape: the curve NEVER rescans prefixes. Each n-gram's FIRST document
    (min doc_id — one map-side-combinable aggregate over the exploded
    n-grams) lands in one step bucket; bucket counts then prefix-sum with
    a single ordered window over the ~(n_docs/step)-row bucket relation —
    the bounded-relation window contract (ranges.py). Exact integers.
    The n-gram construction is a JVM `transform(sequence(...))` over the
    lowered token array: no Python, no second explode.
    """
    toks = F.transform(tokens_col(text), lambda t: F.lower(t))
    if ngram > 1:
        grams = F.expr(
            f"transform(sequence(0, size(__toks) - {ngram}),"
            f" i -> array_join(slice(__toks, i + 1, {ngram}), ' '))"
        )
        exploded = (
            documents.select("doc_id", toks.alias("__toks"))
            .where(F.size("__toks") >= ngram)
            .select("doc_id", F.explode(grams).alias("token"))
        )
    else:
        exploded = documents.select("doc_id", F.explode(toks).alias("token"))
    first = exploded.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    buckets = first.groupBy(
        F.expr(f"first_doc div {step}").alias("b")
    ).agg(F.count(F.lit(1)).alias("new_tokens"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    return buckets.select(
        ((F.col("b") + 1) * step).alias("k_docs"),
        F.col("new_tokens"),
        F.sum("new_tokens").over(w).alias("vocab_size"),
    )


def key_skew_audit(df: DataFrame, group: str, key: str) -> DataFrame:
    """Per-group key-skew report: the shuffle-planning diagnostic run
    BEFORE launching a big keyed job (salting / AQE-skew decisions need
    numbers, not vibes). For each group: distinct keys, total rows, the
    hottest key's count, and the exact integer Gini pair
        gini_num = Σ_i (2i − m − 1)·c_i   (keys sorted by (count, key)),
        gini_den = m · Σ c_i
    so gini = num/den needs no floats and the cross-engine hash is exact.

    One hash aggregate collapses rows to (group, key) counts; the rank
    window is PARTITIONED by group (never global)."""
    counts = df.groupBy(
        F.col(group).alias("grp"), F.col(key).alias("k")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("grp").orderBy("c", "k")
    ranked = counts.select(
        "grp", "c",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("m"),
    )
    return ranked.groupBy("grp").agg(
        F.max("m").alias("n_keys"),
        F.sum("c").alias("total_rows"),
        F.max("c").alias("top1_rows"),
        F.sum(
            (2 * F.col("i") - F.col("m") - 1) * F.col("c")
        ).alias("gini_num"),
        (F.max("m") * F.sum("c")).alias("gini_den"),
    )


_C0_CONTROLS = "".join(
    chr(c) for c in list(range(0, 9)) + [11, 12] + list(range(14, 32))
)


def encoding_anomalies(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-document encoding-damage census — the curation filter CCNet/
    RefinedWeb-class pipelines run before training (mojibake text is
    worse than no text: it teaches the tokenizer garbage codepoints).
    Four exact counters per doc:

      n_fffd    U+FFFD replacement chars (a decoder already gave up)
      n_winmoji 'Ã' occurrences — the signature of UTF-8 bytes decoded
                as latin-1/cp1252 (é -> 'Ã©', etc.)
      n_sqmoji  'â€' pairs — the same damage on punctuation
                (curly quotes/dashes -> 'â€™', 'â€œ', ...)
      n_ctrl    C0 control chars other than tab/newline/CR

    plus `flagged` = any counter > 0.  Deliberately NO regex: counts
    come from length-difference over replace() and translate() — both
    are codepoint-exact and semantics-identical across engines, where
    Java vs RE2 regex classes are not (the cross-engine discipline
    behind the rest of this module).  Whole-stage codegen, no UDF.
    """
    t = F.col(text_col)

    def occurrences(needle: str) -> Column:
        return (
            (F.length(t) - F.length(F.replace(t, F.lit(needle), F.lit(""))))
            / len(needle)
        ).cast("bigint")

    n_ctrl = (
        F.length(t) - F.length(F.translate(t, _C0_CONTROLS, ""))
    ).cast("bigint")
    out = documents.select(
        "doc_id",
        occurrences("�").alias("n_fffd"),
        occurrences("Ã").alias("n_winmoji"),
        occurrences("â€").alias("n_sqmoji"),
        n_ctrl.alias("n_ctrl"),
    )
    return out.withColumn(
        "flagged",
        (
            (F.col("n_fffd") > 0)
            | (F.col("n_winmoji") > 0)
            | (F.col("n_sqmoji") > 0)
            | (F.col("n_ctrl") > 0)
        ).cast("boolean"),
    )


def oov_census(
    documents: DataFrame, vocab_size: int, text: str = "text"
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-`vocab_size` tokens — the two-pass, corpus-RELATIVE quality
    signal the single-pass quality_scores cannot express (a doc full of
    tokens the rest of the corpus never uses is boilerplate, another
    language, or damage — the cheap proxy for a perplexity filter when
    no LM is in reach).

    Vocabulary selection is total-ordered by (count DESC, token ASC),
    so the cut is deterministic under ties.  Returns
    (doc_id, n_tokens, n_oov); rate = n_oov / n_tokens downstream.

    Plan: one token-explode census (partial-aggregatable), a
    TakeOrdered top-N (driver-bounded by vocab_size — never a global
    sort), vocabulary broadcast back, one LEFT join + conditional
    count.  Empty docs report (0, 0).
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    toks = documents.select(
        "doc_id", F.explode_outer(tokens_col(text)).alias("tok")
    )
    vocab = (
        toks.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(int(vocab_size))
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("tok").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_tokens"),
            F.sum(
                F.when(
                    F.col("tok").isNotNull() & F.col("in_vocab").isNull(), 1
                ).otherwise(0)
            ).cast("long").alias("n_oov"),
        )
    )
