"""Corpus-curation operators for training-data pipelines (engine additions).

Three families the reference lacks (it has no text surface at all — its only
string op is tag equality, SURVEY section 2.6) but that a 100 TB
training-data pipeline runs on every corpus:

1. repetition_signals — Gopher-style repetition quality gates: duplicated
   non-empty lines per document and the most-frequent word-bigram's share of
   all bigrams. Everything is emitted as exact integers (counts, not
   fractions) so the keep-flag comparisons are integer cross-multiplications
   and the DuckDB oracle matches bit-for-bit.
2. decontaminate — benchmark decontamination: flag training documents that
   share any word n-gram with a held-out benchmark set. The benchmark side
   is tiny by construction, so candidate generation is a broadcast
   hash-semi-join on the shared 60-bit ngram hash (h60) — the big side
   streams, no shuffle of the corpus.
3. pii_redact — PII detection + redaction: count email/phone matches and
   emit the md5 of the redacted text. Regexes are restricted to the
   character-class + bounded-quantifier subset where Java (Spark) and RE2
   (DuckDB) agree, so the redacted-text hash is a strong cross-engine value
   oracle.

All three are pure Spark built-ins (JVM, whole-stage codegen): no Python in
the hot path. 100 TB posture:
- repetition_signals: one map-side-combinable groupBy on (doc_id, bigram) —
  key cardinality is bounded by corpus token count; partial aggregation
  collapses each document's repeats before the shuffle.
- decontaminate: broadcast of the distinct benchmark-ngram hash set (the
  only collected relation is bounded by the benchmark, never the corpus).
- pii_redact: embarrassingly parallel per-row regex work, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import h60, tokens_col

# Java/RE2-common regexes: character classes + bounded quantifiers only
# (no backrefs, no lookaround), so leftmost-greedy (Java) and
# leftmost-longest (RE2) produce identical matches.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"


def _word_ngrams(toks: Column, n: int) -> Column:
    """1-based sliding word n-grams of an array<string>, space-joined.

    Guarded: fewer than n tokens -> empty array (Spark's sequence(1, 0)
    would otherwise DESCEND and fabricate indices).
    """
    count = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(count >= 1, grams).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    documents: DataFrame,
    max_dup_line_num: int = 3,
    max_dup_line_den: int = 10,
    max_top_bigram_num: int = 1,
    max_top_bigram_den: int = 5,
) -> DataFrame:
    """Gopher-style repetition gate (Rae et al. 2021, table A1 analogs).

    Emits per document: non-empty line count, duplicated-line count
    (occurrences beyond the first of each distinct line), total word-bigram
    count, the top bigram's occurrence count, and an integer-exact keep
    flag: dup_lines/lines <= 3/10 AND top_bigram/bigrams <= 1/5, compared by
    cross-multiplication so the oracle needs no float arithmetic.
    """
    lines = F.filter(
        F.split(F.col("text"), "\n"), lambda x: F.trim(x) != F.lit("")
    )
    line_stats = documents.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        (F.size(lines) - F.size(F.array_distinct(lines))).alias("n_dup_lines"),
    )
    bg = documents.select(
        "doc_id", F.explode(_word_ngrams(tokens_col(), 2)).alias("bigram")
    )
    # (doc_id, bigram) partial-aggregates map-side; the second agg is tiny
    bg_agg = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"), F.sum("c").alias("n_bigrams"))
    )
    out = line_stats.join(bg_agg, "doc_id", "left").select(
        "doc_id",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_dup_lines").cast("bigint").alias("n_dup_lines"),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce(F.col("top_bigram_count"), F.lit(0))
        .cast("bigint")
        .alias("top_bigram_count"),
    )
    keep = (
        out["n_dup_lines"] * max_dup_line_den <= out["n_lines"] * max_dup_line_num
    ) & (
        out["top_bigram_count"] * max_top_bigram_den
        <= out["n_bigrams"] * max_top_bigram_num
    )
    return out.withColumn("keep", keep)


def decontaminate(
    documents: DataFrame,
    n: int = 3,
    bench_mod: int = 53,
) -> DataFrame:
    """Benchmark decontamination by word n-gram overlap.

    The held-out benchmark is the deterministic doc_id % bench_mod == 0
    slice; a training document is contaminated if any of its distinct word
    n-grams appears anywhere in the benchmark. Returns every NON-benchmark
    document with its distinct-overlapping-ngram count and a contaminated
    flag.

    Scale: the benchmark ngram set is distinct-ed and broadcast (it is the
    small dim by construction — real decontamination lists are a few MB of
    eval-suite text); the training corpus explodes its distinct ngrams and
    probes the broadcast hash relation. No corpus-sized shuffle.
    """
    grams = _word_ngrams(tokens_col(), n)
    is_bench = F.col("doc_id") % bench_mod == 0
    bench_ngrams = (
        documents.filter(is_bench)
        .select(F.explode(F.array_distinct(grams)).alias("g"))
        .select(h60(F.col("g")).alias("gh"))
        .distinct()
    )
    train = documents.filter(~is_bench)
    train_ngrams = train.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("g")
    ).select("doc_id", h60(F.col("g")).alias("gh"))
    overlap = (
        train_ngrams.join(F.broadcast(bench_ngrams), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return train.select("doc_id").join(overlap, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
    )


def with_synthetic_pii(documents: DataFrame, every: int = 3) -> DataFrame:
    """Deterministically inject PII into every `every`-th document.

    The driver corpus is digit-free word salad, so an honest PII pass over
    raw `text` would be all-zeros — a wiring-only oracle. This derivation
    (same expression in the DuckDB twin) plants one email and one phone per
    selected doc so the regex ENGINE behavior is what the cross-engine hash
    actually verifies.
    """
    planted = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return documents.withColumn(
        "pii_text",
        F.when(F.col("doc_id") % every == 0, planted).otherwise(F.col("text")),
    )


def pii_redact(documents: DataFrame, text_col: str = "pii_text") -> DataFrame:
    """Count and redact email/phone PII; emit md5 of the redacted text.

    Pure JVM regex work, zero shuffles; the md5 makes the full redacted
    string a value oracle without shipping megabytes of text through the
    compare.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("bigint").alias("n_chars_redacted"),
    )


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Overlapping fixed-size token windows per document — the passage
    construction step every retrieval/training pipeline runs before
    embedding or packing.

    Windows start at 0, stride, 2*stride, ... (stride = chunk_tokens -
    overlap) while the start is inside the token array; the last chunk
    may be shorter. Tokens are the engine's shared whitespace
    tokenization (textstats.tokens_col), re-joined with single spaces so
    the chunk text is whitespace-normalized and deterministic across
    engines. Empty documents produce zero chunks.

    Plan: one projection computes the token array and the start
    sequence, one explode emits the windows, `slice` + `array_join`
    build each chunk — all JVM built-ins in a single whole-stage-codegen
    stage, NO shuffle and NO Python. Row amplification is
    ceil(n_tokens / stride) per document, the output's intrinsic size.
    """
    if chunk_tokens <= 0 or not 0 <= overlap < chunk_tokens:
        raise ValueError("need chunk_tokens > 0 and 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens_col(text)
    starts = F.when(
        F.size(toks) == 0, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride)))
    return (
        documents.select(
            F.col(doc_id), toks.alias("_toks"), F.explode(starts).alias("_s")
        )
        .select(
            doc_id,
            (F.col("_s") / stride).cast("bigint").alias("chunk_id"),
            F.least(
                F.lit(chunk_tokens), F.size("_toks") - F.col("_s")
            ).cast("bigint").alias("n_tokens"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("_s") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
        )
    )


def cdc_boundary_pred(
    text_expr: str,
    p_expr: str,
    window: int = 8,
    base: int = 31,
    divisor: int = 32,
) -> str:
    """Engine-shared SQL predicate: the rolling polynomial hash of the
    `window` characters ending just before cut position `p_expr`
    (1-based) is ≡ 0 (mod divisor). Plain ascii/substr/CAST SQL that
    Spark SQL and DuckDB both accept VERBATIM — written once, used by
    the operator's filter lambda and by the driver oracle, the exprdsl
    dual-render idea specialized to string kernels.

    No intermediate modulus is needed: codepoints < 2^21 times
    31^7 < 2^35 summed 8 ways stays far below 2^63, so the single final
    `%` is exact int64 in both engines.
    """
    terms = " + ".join(
        f"CAST(ascii(substr({text_expr}, CAST({p_expr} - {window - j} AS INT), 1))"
        f" AS BIGINT) * {base ** (window - 1 - j)}"
        for j in range(window)
    )
    return f"({terms}) % {divisor} = 0"


def cdc_chunks(
    documents: DataFrame,
    window: int = 8,
    base: int = 31,
    divisor: int = 32,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Content-defined chunking (Rabin/Gear-style): cut wherever the
    rolling hash of the trailing `window` chars hits 0 mod `divisor`.

    Unlike fixed-size chunking (chunk_documents), boundaries are a pure
    function of LOCAL content, so inserting a prefix into a document
    shifts only the chunks before the first surviving boundary — every
    later chunk keeps its exact span content and fingerprint. That
    shift-resilience is why dedup stores and incremental-sync pipelines
    chunk this way; `tests/test_curation_cdc.py` pins it.

    Deliberately NO min/max chunk-size clamp: the clamp makes boundary
    placement depend on the previous boundary (sequential per document),
    while the pure form keeps every position's verdict independent — one
    spread exchange (the CPU-bound-scan precedent, dedup._spread) and
    then a single JVM projection over higher-order functions, no Python,
    and the oracle can state it as one WHERE clause. Expected chunk
    length is `divisor` chars; tails are bounded only by document
    length.

    Returns (doc_id, chunk_id, start, n_chars, fp): 0-based chunk index
    in document order, 1-based start, exact char length, and the shared
    60-bit md5 fingerprint of the chunk text.
    """
    pred = cdc_boundary_pred(text, "p", window, base, divisor)
    from osm_hadoop_spark.operators.dedup import _spread

    d = _spread(documents.filter(F.length(text) > 0)).select(
        doc_id, text, F.length(text).cast("long").alias("_n")
    )
    # The cut array must be EVALUATED ONCE per document. Naming it with
    # withColumn is not enough: project collapsing re-inlines the whole
    # filter(sequence(...)) expression at every reference, so
    # element_at(_cuts, i + 2) inside the pairing transform would re-run
    # the boundary scan per chunk (measured 17x slowdown). Binding it as
    # a lambda variable — transform over a 1-element array — forces one
    # evaluation, keeping the operator a single codegen stage.
    cuts_sql = f"""concat(
  array(CAST(1 AS BIGINT)),
  CASE WHEN _n >= {window + 1}
       THEN filter(sequence(CAST({window + 1} AS BIGINT), _n), p -> {pred})
       ELSE CAST(array() AS ARRAY<BIGINT>) END,
  array(_n + 1))"""
    chunks_sql = f"""element_at(transform(array({cuts_sql}),
  cs -> transform(slice(cs, 1, size(cs) - 1),
        (s, i) -> struct(s AS start, element_at(cs, i + 2) - s AS clen))), 1)"""
    out = d.select(
        doc_id, text, F.posexplode(F.expr(chunks_sql)).alias("chunk_id", "_c")
    )
    return out.select(
        doc_id,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("_c.start").alias("start"),
        F.col("_c.clen").alias("n_chars"),
        h60(
            F.expr(f"substr({text}, CAST(_c.start AS INT), CAST(_c.clen AS INT))")
        ).alias("fp"),
    )


def pack_documents(
    documents: DataFrame,
    capacity: int = 256,
    group: str = "lang",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Sequence packing — the concat-and-chunk construction GPT-style
    pretraining uses: within each `group` stream, documents are
    concatenated in deterministic `doc_id` order and the token stream is
    split at every `capacity` boundary; documents may straddle pack
    boundaries. Emits one row per (document x pack it touches):

        (group, pack_id, doc_id, tok_start_in_doc, tok_in_pack)

    so sum(tok_in_pack) per doc == its token count (lossless), and
    sum(tok_in_pack) per pack == capacity except the stream tail.

    Plan: ONE window per group stream (cumulative token sum — integer,
    order-immune because summands are nonnegative and the frame is a
    running total over a unique (doc_id) order), then pure codegen
    arithmetic: a doc starting at offset s with n tokens spans packs
    s DIV cap .. (s+n-1) DIV cap, exploded with clamped-overlap token
    counts. No join, no Python. Empty docs (0 tokens) are dropped — they
    occupy no stream positions. The deliberately non-atomic semantics
    (docs split at boundaries) is what makes packing distributable: the
    greedy doc-atomic bin-packing alternative is inherently sequential.
    """
    from pyspark.sql import Window

    toks = documents.select(
        F.col(group).alias("grp"),
        F.col(doc_id).alias("doc_id"),
        F.size(tokens_col()).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy("grp").orderBy("doc_id")
    offs = toks.withColumn(
        "start_off", (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    )
    cap = capacity
    first = F.expr(f"start_off div {cap}")
    last = F.expr(f"(start_off + n_tokens - 1) div {cap}")
    ex = offs.select(
        F.col("grp").alias(group),
        "doc_id",
        "n_tokens",
        "start_off",
        F.explode(F.sequence(first, last)).alias("pack_id"),
    )
    lo = F.greatest(F.col("start_off"), F.col("pack_id") * cap)
    hi = F.least(
        F.col("start_off") + F.col("n_tokens"), (F.col("pack_id") + 1) * cap
    )
    return ex.select(
        group,
        F.col("pack_id").cast("bigint").alias("pack_id"),
        "doc_id",
        (lo - F.col("start_off")).cast("bigint").alias("tok_start_in_doc"),
        (hi - lo).cast("bigint").alias("tok_in_pack"),
    )


def blocklist_census(
    documents: DataFrame,
    terms: list[str],
    text_col: str = "text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Blocklist-term census: per term, how many documents contain it and
    how many occurrences exist corpus-wide (case-insensitive substring).

    The filtering gate every training-data pipeline runs before anything
    else (bad-word lists, brand blocklists, policy strings). The term
    list is tiny and broadcast AS LITERALS — each doc row fans out to
    |terms| slim probe rows via posexplode of a literal array, entirely
    map-side; occurrence counting is the codegen length-difference
    identity (no regex, no Python):

        occ(text, t) = (len(text) - len(replace(text, t, ''))) / len(t)

    Output: (term, n_docs, n_occurrences), only terms that hit.

    100 TB posture: one projection with a fixed |terms|-way fan-out, one
    partial-aggregatable groupBy on a key whose cardinality is |terms| —
    map-side combine collapses almost everything before the (tiny)
    shuffle. For |terms| in the thousands-to-millions (true Aho-Corasick
    territory) switch to a broadcast-automaton mapInPandas; the literal
    fan-out is the right plan while |terms| is a config-file-sized list.
    Exactness: counts are integers; lower() on ASCII terms matches
    DuckDB's lower() — the oracle is the same expression per term.
    """
    lit_terms = F.array(*[F.lit(t.lower()) for t in terms])
    lowered = documents.select(
        F.col(doc_id), F.lower(F.col(text_col)).alias("_lt")
    )
    probes = lowered.select(
        doc_id, "_lt", F.posexplode(lit_terms).alias("_ti", "term")
    ).select(
        doc_id,
        "term",
        (
            (F.length("_lt") - F.length(F.expr("replace(_lt, term, '')")))
            / F.length("term")
        ).cast("bigint").alias("occ"),
    )
    return (
        probes.where(F.col("occ") > 0)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("occ").alias("n_occurrences"),
        )
    )


def pii_redact_spans(
    documents: DataFrame, spans_col: str = "spans"
) -> DataFrame:
    """PII redaction INSIDE interleaved span arrays — the content
    transform that must preserve the mandated span-sequence invariant
    (kind, media_ref, order untouched; only text payloads rewritten).

    Flat-text redaction (``pii_redact``) breaks documents that carry
    their text in spans; this variant rewrites each text span in place
    with `transform`, entirely in codegen (no explode/reassembly round
    trip — the array never leaves its row, so span order CANNOT change,
    by construction rather than by discipline).

    DataFrame(doc_id, n_emails, n_phones, spans_fp, kinds_fp) where
    spans_fp is the md5 over the redacted (kind, text, media_ref, offset)
    rendering and kinds_fp the md5 over the kind/offset sequence alone —
    the latter must equal the input's (pinned in tests), which is the
    machine-checkable form of the invariant.

    100 TB posture: map-only, zero shuffles, regex work per span batched
    by codegen; counts are exact integers.
    """
    def _redact(s):
        return F.struct(
            s["kind"].alias("kind"),
            F.regexp_replace(
                F.regexp_replace(s["text"], EMAIL_RE, "<EMAIL>"),
                PHONE_RE,
                "<PHONE>",
            ).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        )

    def _count(pattern):
        return F.aggregate(
            F.col(spans_col),
            F.lit(0).cast("bigint"),
            lambda acc, s: acc
            + F.size(
                F.regexp_extract_all(
                    F.coalesce(s["text"], F.lit("")), F.lit(pattern), F.lit(0)
                )
            ),
        )

    def _canon(col):
        return F.array_join(
            F.transform(
                col,
                lambda s: F.concat_ws(
                    ";",
                    s["kind"],
                    F.coalesce(s["text"], F.lit("")),
                    F.coalesce(s["media_ref"], F.lit("")),
                    s["offset"].cast("string"),
                ),
            ),
            "|",
        )

    kinds_canon = F.array_join(
        F.transform(
            F.col(spans_col),
            lambda s: F.concat_ws(";", s["kind"], s["offset"].cast("string")),
        ),
        "|",
    )
    return documents.select(
        "doc_id",
        _count(EMAIL_RE).alias("n_emails"),
        _count(PHONE_RE).alias("n_phones"),
        F.md5(_canon(F.transform(F.col(spans_col), _redact))).alias("spans_fp"),
        F.md5(kinds_canon).alias("kinds_fp"),
    )


def strip_boilerplate_lines(
    lines: DataFrame,
    threshold_pct: int,
    doc: str = "doc_id",
    group: str = "source",
    pos: str = "pos",
    line: str = "line",
) -> DataFrame:
    """CCNet-style boilerplate line removal, rolled up per document.

    A line is BOILERPLATE within its group (domain / source / crawl
    host) when it occurs in >= threshold_pct percent of the group's
    documents — headers, footers, cookie banners, nav chrome (Wenzek et
    al. 2020 dedup lines per shard; Penedo et al. 2023 RefinedWeb line
    filters). Input is one row per (doc, group, pos, line); output is
    one row per doc: n_kept, n_dropped, and fp = sum over KEPT lines of
    (pos + 1) * (h60(line) % 2^40) — an order-sensitive integer
    fingerprint, truncated so the sum stays far from int64 overflow
    (DuckDB rejects it, ANSI Spark errors on it), of
    the cleaned document, so the oracle pins both the drop DECISION and
    the surviving sequence.

    Plan: two slim hash aggregates build the census — distinct
    (group, line, doc) -> per-(group, line) doc frequency, distinct
    (group, doc) -> group size — then one hash join back onto the line
    stream and one per-doc rollup. Everything JVM, partial-agg friendly;
    the integer gate df * 100 >= pct * n avoids float division.

    100 TB posture: the census shuffles distinct (group, line) pairs —
    boilerplate by definition dedups heavily, so census size is
    sublinear in line volume; the join back is key-distributed with the
    usual hot-line skew answered by AQE. No Python anywhere.
    """
    d, g, p, ln = F.col(doc), F.col(group), F.col(pos), F.col(line)
    per_line = (
        lines.select(g.alias("g"), ln.alias("l"), d.alias("d"))
        .distinct()
        .groupBy("g", "l")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    per_group = (
        lines.select(g.alias("g"), d.alias("d"))
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    flagged = per_line.join(per_group, "g").select(
        "g",
        "l",
        (F.col("df") * 100 >= int(threshold_pct) * F.col("n")).alias("bp"),
    )
    keep = ~F.col("bp")
    return (
        lines.select(d.alias("doc_id"), g.alias("g"), p.alias("p"), ln.alias("l"))
        .join(flagged, ["g", "l"])
        .groupBy("doc_id")
        .agg(
            F.sum(keep.cast("bigint")).alias("n_kept"),
            F.sum(F.col("bp").cast("bigint")).alias("n_dropped"),
            F.sum(
                F.when(
                    keep, (F.col("p") + 1) * (h60(F.col("l")) % (1 << 40))
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("fp"),
        )
    )
