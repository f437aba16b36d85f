"""Dictionary phrase matching: the Aho-Corasick workload, relationally.

Gazetteer tagging — find every occurrence of every multi-token
dictionary phrase in every document — is the standard span-annotation
primitive (place-name gazetteers, blocklists of multi-word terms,
skill/entity lexicons). Single-node NLP reaches for an Aho-Corasick
automaton; the shuffle-shaped form is the POSITION-ALIGNED join:

    tokens(doc, pos, tok)  ⋈  phrase_tokens(pid, i, ptok, plen)
        ON tok = ptok
    GROUP BY (doc, pid, start = pos - i)
    HAVING count(*) = plen

A phrase of length L matches at start s iff all L of its (i, token)
slots align — each aligned (pos, i) pair contributes exactly one row
to its (doc, pid, s) group (pos = s + i is determined by i), so the
count equals the number of satisfied slots, and repeated tokens inside
the phrase or the document fall out correctly (overlapping occurrences
each get their own start).

Plan: one posexplode of the document tokens (the corpus-sized side,
never shuffled on anything but the final group keys), one BROADCAST
equi-join against the phrase-token dimension (dictionaries are
config-sized), one hash aggregate. No regex, no per-row Python, no
automaton state.

100 TB posture: the join fans each document token out by the number of
DISTINCT phrases containing that token — bounded by dictionary size,
and in practice by stop-word hygiene in the dictionary (a phrase made
of only ultra-common tokens costs its document frequency, exactly as
it would feed an automaton). The aggregate keys (doc, pid, start) are
as fine-grained as the matches themselves — no skew pivot. For
dictionaries too large to broadcast, the same plan works as a shuffle
hash join on tok; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.textstats import tokens_col


def phrase_match(
    docs: DataFrame,
    phrases: DataFrame,
    doc_id: str = "doc_id",
    text: str = "text",
    phrase_id: str = "phrase_id",
    phrase: str = "phrase",
) -> DataFrame:
    """(doc_id, phrase_id, start): every occurrence of every dictionary
    phrase, start = 0-based token offset. Phrases are whitespace-token
    sequences matched exactly (same tokenizer as the corpus side)."""
    toks = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.posexplode(tokens_col(text)).alias("pos", "tok"),
    )
    parr = phrases.select(
        F.col(phrase_id).alias("phrase_id"),
        F.split(F.trim(F.col(phrase)), r"\s+").alias("ptoks"),
    )
    pt = parr.select(
        "phrase_id",
        F.size("ptoks").alias("plen"),
        F.posexplode("ptoks").alias("i", "tok"),
    )
    return (
        toks.join(F.broadcast(pt), "tok")
        .groupBy(
            "doc_id", "phrase_id",
            (F.col("pos") - F.col("i")).alias("start"), "plen",
        )
        .agg(F.count(F.lit(1)).alias("n_slots"))
        .filter(F.col("n_slots") == F.col("plen"))
        .select("doc_id", "phrase_id", F.col("start").cast("long"))
    )


def phrase_census(
    docs: DataFrame,
    phrases: DataFrame,
    doc_id: str = "doc_id",
    text: str = "text",
    phrase_id: str = "phrase_id",
    phrase: str = "phrase",
) -> DataFrame:
    """(phrase, n_hits, n_docs) per dictionary entry — zero-hit
    phrases still emit (the blocklist-audit contract)."""
    m = phrase_match(docs, phrases, doc_id, text, phrase_id, phrase)
    agg = m.groupBy("phrase_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
    )
    return (
        phrases.select(F.col(phrase_id).alias("phrase_id"),
                       F.col(phrase).alias("phrase"))
        .join(agg, "phrase_id", "left")
        .select(
            "phrase",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        )
    )
