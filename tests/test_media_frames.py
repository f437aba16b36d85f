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
