"""URL canonicalization + registrable-domain extraction (web-corpus ops).

Every web-scale corpus pipeline (CCNet, RefinedWeb, Dolma) begins by
normalizing document URLs: without it, host-level dedup and domain
mixing/blocklists fracture across trivially-different spellings
(`HTTPS://WWW.Site.com:443/p?utm_source=x&id=1#frag` vs
`https://site.com/p?id=1`). The reference engine has no web surface;
this extends the corpus-curation family (blocklist_census, mixture
rebalance, leakage split) with the missing key-normalization stage.

Canonical form (the conservative, dedup-safe subset of RFC 3986
normalization — semantics-preserving only):
  - scheme and host lowercased; a leading `www.` stripped;
  - default port stripped (`:443` for https, `:80` for http);
  - fragment dropped (never sent to the server);
  - tracking parameters dropped (`utm_*` — the industry-standard strip
    list; extend via `drop_params_prefix`);
  - remaining query parameters SORTED lexicographically (parameter order
    is almost never significant; sorting makes equal-parameter URLs
    compare equal) and re-joined; an emptied query drops its `?`;
  - path left byte-exact (case and encoding in paths ARE significant).

Registrable domain: last label pair, or last THREE labels when the
2-label suffix is a multi-part public suffix (`co.uk`-style). The full
Public Suffix List is a data file, not code; `MULTI_TLD` carries the
common multi-part suffixes and is the documented extension point.

Everything is JVM string/array expressions — regexp_extract, transform,
filter, array_sort, concat_ws — inside whole-stage codegen: no UDF, no
shuffle, linear scan. The DuckDB twin replays the same normalization
with the same regexes (both dialects are RE2-compatible for the
patterns used), so the oracle is value-exact per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MULTI_TLD = ["co.uk", "ac.uk", "com.au", "co.jp", "com.br"]

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def canonicalize_url(url: Column, drop_params_prefix: str = "utm_") -> dict:
    """Columns {canon, host, domain} for a URL column (see module doc)."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _URL_RE, 2))
    path = F.regexp_extract(url, _URL_RE, 3)
    query = F.regexp_extract(url, _URL_RE, 4)

    host = F.regexp_replace(hostport, r":(443|80)$", "")
    host = F.regexp_replace(host, r"^www\.", "")

    params = F.filter(
        F.split(F.regexp_replace(query, r"^\?", ""), "&"),
        lambda p: (p != "") & ~p.startswith(drop_params_prefix),
    )
    q_sorted = F.array_join(F.array_sort(params), "&")
    q_part = F.when(q_sorted == "", F.lit("")).otherwise(F.concat(F.lit("?"), q_sorted))

    canon = F.concat(scheme, F.lit("://"), host, path, q_part)

    hostname = F.regexp_replace(host, r":\d+$", "")  # ports never enter domains
    labels = F.split(hostname, r"\.")
    n = F.size(labels)
    two = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    three = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    domain = F.when(n <= 2, hostname).otherwise(
        F.when(two.isin(MULTI_TLD) & (n >= 3), three).otherwise(two)
    )
    return {"canon": canon, "host": host, "domain": domain}


def url_census(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Per registrable domain: page count and distinct canonical URLs —
    the host-level dedup/mixing census. One scan + one partial-agg
    groupBy (count_distinct on the canonical string)."""
    c = canonicalize_url(F.col(url_col))
    return (
        docs.select(c["canon"].alias("canon"), c["domain"].alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("canon").alias("n_canon"),
        )
    )
