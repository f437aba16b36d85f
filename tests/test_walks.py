"""Random-walk corpus generation (operators/walks.py): bit-exact
replay against an independent hashlib-md5 Python walker, completeness
on sinkless graphs, and sink-termination semantics."""

import hashlib

from osm_hadoop_spark.operators.walks import random_walks


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replay(edges, walks_per_node, length, tag):
    adj = {}
    for u, v in sorted(set(edges)):
        adj.setdefault(u, []).append(v)
    rows = set()
    for start in adj:
        for w in range(walks_per_node):
            cur = start
            rows.add((start, w, 0, cur))
            for t in range(1, length + 1):
                nxt = adj.get(cur)
                if not nxt:
                    break
                cur = nxt[_h60(f"{tag}{start}_{w}_{t}") % len(nxt)]
                rows.add((start, w, t, cur))
    return rows


def test_walks_match_independent_replay(spark):
    # symmetrized ring + chords: sinkless, irregular degrees
    base = [(i, (i + 1) % 9) for i in range(9)] + [(0, 4), (2, 7), (5, 1)]
    edges = sorted(set(base) | {(v, u) for u, v in base})
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        (r.start, r.w, r.t, r.node)
        for r in random_walks(df, walks_per_node=3, length=6, tag="tw").collect()
    }
    want = _replay(edges, 3, 6, "tw")
    assert got == want
    # sinkless: every walk reaches full length
    assert len(got) == 9 * 3 * 7


def test_walks_stop_at_sinks(spark):
    # directed path 1 -> 2 -> 3, 3 is a sink
    df = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    got = {
        (r.start, r.w, r.t, r.node)
        for r in random_walks(df, walks_per_node=1, length=4, tag="s").collect()
    }
    # only nodes with out-degree >= 1 start walks; walks stop at node 3
    assert got == {
        (1, 0, 0, 1), (1, 0, 1, 2), (1, 0, 2, 3),
        (2, 0, 0, 2), (2, 0, 1, 3),
    }


def test_walks_checkpoint_path(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "u long, v long"
    )
    out = random_walks(df, walks_per_node=1, length=5, tag="c",
                       checkpoint_every=2)
    assert out.count() == 3 * 6  # localCheckpoint rounds preserve rows
