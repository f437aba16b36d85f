"""PassJoin edit-distance self-join (operators/fuzzyjoin.py).

The brute force is a from-scratch DP levenshtein over ALL pairs — no
blocking — so agreement proves the segment blocking loses nothing
(complete recall), which is the operator's whole claim. Crafted cases
sit exactly AT and just OVER the threshold, plus planted single-edit
families (substitution / insertion / deletion at head, middle, tail).
Also pins that Spark's levenshtein and DuckDB's agree on the same pairs,
since the driver oracle verifies with DuckDB's.
"""

from __future__ import annotations

import hashlib

from osm_hadoop_spark.operators.fuzzyjoin import edit_distance_selfjoin

K = 2


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(strings):
    out = {}
    ids = sorted(strings)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            d = _lev(strings[ids[ai]], strings[ids[bi]])
            if d <= K:
                out[(ids[ai], ids[bi])] = d
    return out


def _corpus():
    def h(s, m):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m

    w1 = "crimson amber cobalt jade ivory slate coral bronze".split()
    w2 = "widget flange bracket rotor".split()
    strings = {}
    for i in range(170):
        strings[i] = (
            f"{w1[h(f'fa{i}', len(w1))]} {w2[h(f'fb{i}', len(w2))]}"
            f" {h(f'fc{i}', 30)}"
        )
    # planted single edits around a base string
    base = "cerulean gearbox 77"
    strings[500] = base
    strings[501] = "cerulean gearbax 77"      # substitution, middle
    strings[502] = "xcerulean gearbox 77"     # insertion, head
    strings[503] = "cerulean gearbox 7"       # deletion, tail
    strings[504] = "cerulean gearbax 78"      # two edits: dist exactly 2
    strings[505] = "cerulean gxarbax 78"      # three edits: just over
    return strings


def test_passjoin_matches_quadratic_brute(spark):
    strings = _corpus()
    df = spark.createDataFrame(list(strings.items()), "sid long, s string")
    got = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in edit_distance_selfjoin(df, K).collect()
    }
    want = _brute(strings)
    assert got == want
    assert len(want) > 40  # the corpus genuinely has near-dups
    # the planted family behaved
    assert got[(500, 501)] == 1
    assert got[(500, 502)] == 1
    assert got[(500, 503)] == 1
    assert got[(500, 504)] == 2
    assert (500, 505) not in got
    assert got[(501, 504)] == 1
    # exact duplicates (dist 0) between different ids are reported
    assert 0 in set(got.values())


def test_spark_and_duckdb_levenshtein_agree(spark):
    import duckdb

    strings = list(_corpus().values())
    pairs = [(a, b) for a in strings[:25] for b in strings[:25]]
    sdf = spark.createDataFrame(pairs, "a string, b string")
    got = [
        r["d"]
        for r in sdf.selectExpr("levenshtein(a, b) AS d").collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        for a, b in pairs
    ]
    brute = [_lev(a, b) for a, b in pairs]
    assert got == want == brute


def test_passjoin_plan_no_python_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, f"string number {i}") for i in range(20)], "sid long, s string"
    )
    plan = (
        edit_distance_selfjoin(df, K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan
