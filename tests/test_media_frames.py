"""sample_frames: byte-level equivalence to a pure-Python recomputation
from the synthetic derivation (header parse, stride math, chunk cut)."""

from osm_hadoop_spark.operators.multimodal import sample_frames, synth_media_bytes

DOCS = [
    (0, "hello world, a medium document body"),   # fr = len%8+1
    (1, ""),                                       # empty body -> no rows
    (2, "abc"),                                    # tiny body, fr = 4
    (3, "x" * 63),                                 # fr = 63%8+1 = 8 > k
    (4, "Ω unicode ≠ ascii"),                      # multibyte utf-8 body
]


def _expect():
    out = []
    for did, text in DOCS:
        body = text.encode("utf-8")
        if not body:
            continue
        fr = len(body) % 8 + 1
        step = max(len(body) // fr, 1)
        kk = min(4, fr)
        for j in range(kk):
            fi = j * fr // 4 if fr >= 4 else j
            chunk = body[fi * step:(fi + 1) * step]
            out.append((did, j, fi, len(chunk), chunk.hex().upper()))
    return sorted(out)


def test_sample_frames_matches_derivation(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    media = synth_media_bytes(docs).select("doc_id", "media")
    got = sorted(
        (r["doc_id"], r["slot"], r["frame_idx"], r["frame_len"], r["frame_hex"])
        for r in sample_frames(media, k=4).collect()
    )
    assert got == _expect()


def test_chunks_cover_disjoint_prefix(spark):
    # sampled frame lengths are all `step`, never overlapping: for fr >= k
    # the frame indices are strictly increasing
    docs = spark.createDataFrame([(9, "y" * 50)], "doc_id long, text string")
    media = synth_media_bytes(docs).select("doc_id", "media")
    rows = sorted(
        (r["slot"], r["frame_idx"], r["frame_len"])
        for r in sample_frames(media, k=4).collect()
    )
    fr = 50 % 8 + 1  # 3 -> fewer frames than k
    assert len(rows) == min(4, fr)
    idxs = [fi for _, fi, _ in rows]
    assert idxs == sorted(set(idxs))


def test_shot_boundaries(spark):
    import hashlib

    from osm_hadoop_spark.operators.multimodal import shot_boundaries

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % (1 << 60)

    def ham(a, b):
        return bin(h60(a) ^ h60(b)).count("1")

    rows = [
        (1, 0, "AA"), (1, 1, "BB"), (1, 2, "CC"),   # multi-frame doc
        (2, 0, "DD"),                                # single frame
        (3, 0, "EE"), (3, 1, "EE"),                  # identical frames
    ]
    df = spark.createDataFrame(rows, "doc_id long, slot long, frame_hex string")

    # pick a threshold separating the hand pairs: identical -> 0
    got = {
        r["doc_id"]: (r["n_frames"], r["n_shots"], r["max_ham"], r["bslots"])
        for r in shot_boundaries(df, threshold=1).collect()
    }
    h01, h12 = ham("AA", "BB"), ham("BB", "CC")
    # threshold 1: every differing pair is a cut, identical pair is not
    assert got[1] == (3, 3, max(h01, h12), 1 + 2)
    assert got[2] == (1, 1, 0, 0)
    assert got[3] == (2, 1, 0, 0)

    # threshold above both distances: no cuts anywhere
    got_hi = {
        r["doc_id"]: r["n_shots"]
        for r in shot_boundaries(df, threshold=61).collect()
    }
    assert got_hi == {1: 1, 2: 1, 3: 1}

    # threshold between the two pair distances: exactly one cut
    lo, hi = sorted([h01, h12])
    if lo != hi:
        got_mid = {
            r["doc_id"]: (r["n_shots"], r["bslots"])
            for r in shot_boundaries(df, threshold=hi).collect()
        }
        cut_slot = 1 if h01 == hi else 2
        assert got_mid[1] == (2, cut_slot)
