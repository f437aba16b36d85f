"""Content-defined chunking (operators/curation.py::cdc_chunks).

The brute force re-derives boundaries by literally hashing every
character window in Python and fingerprints chunks with hashlib —
independent of the SQL predicate. The headline property test is the
REASON CDC exists: prepending a prefix to a document leaves every chunk
after the first surviving boundary bit-identical (same spans, same
fingerprints), where fixed-size chunking would shift them all.
"""

from __future__ import annotations

import hashlib

from osm_hadoop_spark.operators.curation import cdc_boundary_pred, cdc_chunks

W, BASE, DIV = 8, 31, 32


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute(docs):
    out = {}
    for doc_id, s in docs.items():
        n = len(s)
        if n == 0:
            continue
        cuts = [1]
        for p in range(W + 1, n + 1):
            h = sum(
                ord(s[p - 1 - W + j]) * BASE ** (W - 1 - j) for j in range(W)
            )
            if h % DIV == 0:
                cuts.append(p)
        cuts.append(n + 1)
        for i, (a, b) in enumerate(zip(cuts, cuts[1:])):
            out[(doc_id, i)] = (a, b - a, _h60(s[a - 1 : b - 1]))
    return out


def _docs():
    import random

    rng = random.Random(41)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    docs = {}
    for i in range(60):
        docs[i] = " ".join(rng.choice(words) for _ in range(rng.randint(0, 80)))
    docs[100] = ""  # dropped
    docs[101] = "tiny"  # shorter than the window: one whole-doc chunk
    return docs


def test_cdc_matches_brute(spark):
    docs = _docs()
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start"], r["n_chars"], r["fp"])
        for r in cdc_chunks(df, W, BASE, DIV).collect()
    }
    want = _brute(docs)
    assert got == want
    assert all(d != 100 for d, _ in got)  # empty doc dropped
    assert got[(101, 0)] == (1, 4, _h60("tiny"))
    # real splits happened somewhere
    assert max(k for _, k in got) >= 3
    # spans tile each doc exactly
    for d, s in docs.items():
        if not s:
            continue
        spans = sorted(v[:2] for (dd, _), v in got.items() if dd == d)
        assert spans[0][0] == 1
        assert sum(ln for _, ln in spans) == len(s)
        for (a, la), (b, _) in zip(spans, spans[1:]):
            assert a + la == b


def test_cdc_shift_resilience(spark):
    base_text = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill and the rain keeps falling "
        "on the old tin roof of the house by the river bend"
    )
    docs = {1: base_text, 2: "INSERTED PREFIX >> " + base_text}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    rows = cdc_chunks(df, W, BASE, DIV).collect()
    fps = {d: [] for d in docs}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
        fps[r["doc_id"]].append(r["fp"])
    # every chunk after the first boundary of the original reappears
    # identically in the prefixed document (fingerprint suffix match)
    tail = fps[1][1:]
    assert len(tail) >= 2
    assert fps[2][-len(tail):] == tail
    # sanity: the leading chunks DID change
    assert fps[1][0] != fps[2][0]


def test_cdc_predicate_is_engine_shared():
    import duckdb

    # the exact predicate string the Spark filter lambda uses must run
    # verbatim in DuckDB and agree with the Python brute force
    pred = cdc_boundary_pred("text", "p", W, BASE, DIV)
    s = "content defined chunking shared predicate check string"
    con = duckdb.connect()
    got = [
        r[0]
        for r in con.execute(
            f"""SELECT p FROM (SELECT ? AS text,
                 UNNEST(generate_series({W + 1}, {len(s)})) AS p)
                WHERE {pred}""",
            [s],
        ).fetchall()
    ]
    want = [
        p
        for p in range(W + 1, len(s) + 1)
        if sum(ord(s[p - 1 - W + j]) * BASE ** (W - 1 - j) for j in range(W))
        % DIV
        == 0
    ]
    assert got == want


def test_cdc_plan_is_spread_plus_one_stage(spark):
    df = spark.createDataFrame([(1, "some text " * 30)], "doc_id long, text string")
    plan = (
        cdc_chunks(df)._jdf.queryExecution().executedPlan().toString()
    )
    # exactly the spread exchange, then pure JVM expression work
    assert plan.count("Exchange") == 1
    assert "Python" not in plan and "BatchEval" not in plan
