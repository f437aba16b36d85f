"""Boilerplate line removal (curation.strip_boilerplate_lines)."""

from __future__ import annotations

import hashlib


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _fp(kept):  # kept: [(pos, line)]
    return sum((p + 1) * (_h60(ln) % (1 << 40)) for p, ln in kept)


def test_strip_boilerplate_census_and_fp(spark):
    from osm_hadoop_spark.operators.curation import strip_boilerplate_lines

    rows = []
    # group g1: 4 docs; "HDR" in all 4 (100%), "NAV" in 2 of 4 (exactly
    # 50% — boundary: df*100 >= 50*n holds, so it DROPS at pct=50),
    # "x<i>" unique per doc.
    for i in range(4):
        rows.append((i, "g1", 0, "HDR"))
        if i < 2:
            rows.append((i, "g1", 1, "NAV"))
        rows.append((i, "g1", 2, f"x{i}"))
    # group g2: 3 docs; "HDR" occurs in 2 of 3 (67% -> drops) while the
    # unique lines sit at 33% < 50% (kept) — census is per-group.
    rows.append((10, "g2", 0, "HDR"))
    rows.append((10, "g2", 1, "body"))
    rows.append((11, "g2", 0, "HDR"))
    rows.append((12, "g2", 0, "other"))
    df = spark.createDataFrame(
        rows, "doc_id long, source string, pos long, line string"
    )
    got = {
        r["doc_id"]: (r["n_kept"], r["n_dropped"], r["fp"])
        for r in strip_boilerplate_lines(df, 50).collect()
    }
    assert got[0] == (1, 2, _fp([(2, "x0")]))
    assert got[1] == (1, 2, _fp([(2, "x1")]))
    assert got[2] == (1, 1, _fp([(2, "x2")]))
    assert got[3] == (1, 1, _fp([(2, "x3")]))
    assert got[10] == (1, 1, _fp([(1, "body")]))
    assert got[11] == (0, 1, 0)  # every line dropped, doc still reported
    assert got[12] == (1, 0, _fp([(0, "other")]))

    # at pct=51 the exactly-50% NAV line survives (boundary is >=)
    got51 = {
        r["doc_id"]: (r["n_kept"], r["n_dropped"])
        for r in strip_boilerplate_lines(df, 51).collect()
    }
    assert got51[0] == (2, 1)   # NAV kept, HDR still 100% -> dropped
    assert got51[10] == (1, 1)  # g2's HDR at 67% still drops


def test_strip_boilerplate_fp_is_order_sensitive(spark):
    from osm_hadoop_spark.operators.curation import strip_boilerplate_lines

    a = [(1, "g", 0, "aa"), (1, "g", 1, "bb"), (2, "g", 0, "bb"),
         (2, "g", 1, "aa")]
    df = spark.createDataFrame(
        a, "doc_id long, source string, pos long, line string"
    )
    got = {r["doc_id"]: r["fp"]
           for r in strip_boilerplate_lines(df, 200).collect()}
    # same line multiset, different order -> different fingerprints
    assert got[1] != got[2]
