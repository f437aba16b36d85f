"""Semi-structured (JSON) column profiling — top-level key census.

The first question a lake table with a JSON blob column gets asked is
"what fields are actually in there, and how often" — schema inference
for evolution tracking, dead-field detection, and the prerequisite for
promoting hot keys to real columns.  profile.py profiles TYPED
columns; this is its semi-structured sibling: one row per observed
top-level key with its document count, plus the `__invalid__` bucket
counting rows whose payload failed to parse (NULL or malformed — the
operational signal a pipeline wants surfaced, not dropped).

Engine note: key extraction uses each engine's native JSON parser
(Spark `json_object_keys`, DuckDB `json_keys`) — the cross-engine
contract is on VALID documents (both parsers agree on RFC 8259 object
keys); the oracle derivations therefore construct valid JSON by
engine-identical string building and the invalid bucket is pinned by
pytest on the Spark side.

Plan: one projection + explode_outer + one partial-aggregatable
groupBy — whole-stage codegen except the JSON parse itself (JVM
intrinsic, not Python).  Duplicate keys within one document count once
per occurrence, matching both parsers' list semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INVALID_KEY = "__invalid__"


def json_key_census(
    df: DataFrame, json_col: str
) -> DataFrame:
    """df(<json_col> string, ...) -> (key, n_docs): per top-level JSON
    key the number of documents carrying it; NULL/malformed payloads
    counted under INVALID_KEY."""
    keys = F.json_object_keys(F.col(json_col))
    # plain explode (not _outer): a valid empty object has zero keys
    # and must contribute nothing; the invalid branch is never empty
    exploded = df.select(
        F.explode(
            F.when(keys.isNotNull(), keys).otherwise(
                F.array(F.lit(INVALID_KEY))
            )
        ).alias("key")
    )
    return exploded.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
