"""Multimodal column plumbing (engine additions; decode stubbed).

Media travel as opaque `binary` columns with typed metadata structs. The
Spark-side plumbing — schemas, Arrow batch shape, partition behavior — is
real and tested; the actual codec work is stubbed deterministically because
this container ships no image/audio libraries (PIL/ffmpeg absent):

  - decode_metadata: vectorized header parse (one np.frombuffer view over
    the concatenated batch + an offsets array — no per-row Python loop);
    buffers without the OSMM stub magic fall through to a real codec probe
    (PIL.Image.open) that activates automatically when Pillow is present;
  - resize_stub / frame_sample_stub: shape-preserving deterministic
    transforms standing in for real resize / frame extraction, same UDF
    signatures a real implementation would use;
  - attach_media: derives a binary column deterministically from text so
    the driver's flat documents table can exercise the plumbing end-to-end.

Every op is `mapInPandas`/`pandas_udf` over Arrow binary arrays — the batch
shape (one buffer per row, zero-copy into numpy via frombuffer) is exactly
what a real decoder would consume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_MAGIC = b"OSMM"
HEADER_LEN = 12  # magic(4) + width(2) + height(2) + n_frames(2) + kind(2)

# Optional real codec: activates automatically if the environment ever
# provides Pillow. Buffers that don't carry the OSMM stub magic are probed
# with PIL.Image.open; without PIL they raise NotImplementedError (the
# documented stub boundary).
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None


def _h60_py(s: str) -> int:
    """Python twin of textstats.h60 (bigint of first 15 md5 hex chars)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@F.pandas_udf(T.BinaryType())
def _synth_media_udf(text: pd.Series) -> pd.Series:
    out = []
    for t in text:
        t = t or ""
        body = t.encode("utf-8")
        w = _h60_py(t) % 240 + 16
        h = _h60_py(t[::-1]) % 180 + 12
        fr = len(body) % 8 + 1
        kd = 1
        header = MEDIA_MAGIC + bytes(
            [w & 255, w >> 8, h & 255, h >> 8, fr & 255, fr >> 8, kd & 255, kd >> 8]
        )
        out.append(header + body)
    return pd.Series(out)


def synth_media_bytes(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic fake media payload derived from the text:
    header(magic, w, h, frames, kind) + utf-8 body, where
    w = h60(text)%240+16, h = h60(reverse(text))%180+12,
    frames = octet_length(utf8(text))%8+1 — a derivation any SQL engine can
    recompute, so decode_metadata gets an exact cross-engine oracle."""
    return documents.withColumn("media", _synth_media_udf(F.coalesce(F.col(text_col), F.lit(""))))


def _decode_real(buf: bytes) -> tuple[int, int, int, int]:
    """Real-codec probe for non-OSMM buffers: PIL when available, else the
    documented NotImplementedError stub boundary."""
    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(buf)) as img:
            return img.width, img.height, getattr(img, "n_frames", 1), 2
    raise NotImplementedError(
        "real media decoding is not available in this environment; "
        "only the deterministic OSMM stub header is supported"
    )


def _decode_header(buf: bytes) -> tuple[int, int, int, int]:
    """Single-buffer decode: OSMM stub header, PIL fallback for real media."""
    if buf is None or len(buf) < HEADER_LEN or buf[:4] != MEDIA_MAGIC:
        return _decode_real(buf or b"")
    w = buf[4] | (buf[5] << 8)
    h = buf[6] | (buf[7] << 8)
    frames = buf[8] | (buf[9] << 8)
    kind = buf[10] | (buf[11] << 8)
    return w, h, frames, kind


def _decode_batch(bufs: list[bytes]) -> pd.DataFrame:
    """Vectorized header decode for a whole Arrow batch: one concatenated
    uint8 view + an offsets array (np.frombuffer), no per-row Python loop.
    Rows without the OSMM magic take the rare-path per-row real-codec probe."""
    n = len(bufs)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    blob = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(lens[:-1], out=starts[1:])
    ok = lens >= HEADER_LEN
    safe = np.where(ok, starts, 0)  # short rows index 0 harmlessly, masked out
    if blob.size >= HEADER_LEN:
        for i, m in enumerate(MEDIA_MAGIC):
            ok &= blob[safe + i] == m
        safe = np.where(ok, starts, 0)

        def field(off: int) -> np.ndarray:
            return blob[safe + off].astype(np.int32) | (
                blob[safe + off + 1].astype(np.int32) << 8
            )

        w, h, fr, kd = field(4), field(6), field(8), field(10)
    else:
        ok &= False
        w = h = fr = kd = np.zeros(n, dtype=np.int32)
    nb = (lens - HEADER_LEN).astype(np.int32)
    if not ok.all():
        for i in np.flatnonzero(~ok):
            rw, rh, rfr, rkd = _decode_real(bufs[i])
            w[i], h[i], fr[i], kd[i], nb[i] = rw, rh, rfr, rkd, lens[i]
    return pd.DataFrame(
        {"width": w, "height": h, "n_frames": fr, "kind": kd, "n_bytes": nb}
    )


def decode_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """binary -> typed metadata struct (width, height, n_frames, kind, n_bytes)."""

    def decode(batches):
        for pdf in batches:
            bufs = [bytes(b) if b is not None else b"" for b in pdf[media_col]]
            m = _decode_batch(bufs)
            out = pdf[[c for c in pdf.columns if c != media_col]].reset_index(drop=True)
            yield pd.concat([out, m], axis=1)

    cols = [f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema.fields if f.name != media_col]
    schema = ", ".join(cols + ["width int", "height int", "n_frames int",
                               "kind int", "n_bytes int"])
    return df.mapInPandas(decode, schema=schema)


@F.pandas_udf(T.BinaryType())
def resize_stub(media: pd.Series) -> pd.Series:
    """Deterministic stand-in for image resize: halves the body by taking
    every other byte (keeps header, halves w/h fields)."""
    out = []
    for buf in media:
        b = bytes(buf)
        w, h, fr, kd = _decode_header(b)
        nw, nh = max(w // 2, 1), max(h // 2, 1)
        header = MEDIA_MAGIC + bytes(
            [nw & 255, nw >> 8, nh & 255, nh >> 8, fr & 255, fr >> 8, kd & 255, kd >> 8]
        )
        out.append(header + b[HEADER_LEN::2])
    return pd.Series(out)


@F.pandas_udf(T.ArrayType(T.BinaryType()))
def frame_sample_stub(media: pd.Series) -> pd.Series:
    """Deterministic stand-in for video frame sampling: splits the body into
    n_frames equal chunks and returns them as an array of frame buffers."""
    out = []
    for buf in media:
        b = bytes(buf)
        _w, _h, fr, _kd = _decode_header(b)
        body = b[HEADER_LEN:]
        step = max(len(body) // fr, 1) if body else 1
        out.append([body[i * step:(i + 1) * step] for i in range(fr)] if body else [])
    return pd.Series(out)


def sample_frames(df: DataFrame, k: int = 4, media_col: str = "media") -> DataFrame:
    """Uniform-stride frame sampling with byte-level provenance.

    Picks min(k, n_frames) frames at indices floor(j * n_frames / k),
    cuts each with the same floor-step chunking as frame_sample_stub, and
    emits (doc_id, slot, frame_idx, frame_len, frame_hex). The hex of the
    actual frame BYTES is the check a value oracle can recompute from the
    synthetic derivation (a slice of hex(body) — DuckDB has no BLOB
    md5/substring, so the hex string IS the portable byte-level witness),
    and the driver query verifies the Arrow byte plumbing end to end —
    not just the header arithmetic. Empty bodies emit no rows (a real
    sampler has no frames to cut)."""

    def run(batches):
        for pdf in batches:
            if pdf.shape[0] == 0:
                continue
            ids, slots, idxs, lens, hexes = [], [], [], [], []
            for did, buf in zip(pdf["doc_id"], pdf[media_col]):
                b = bytes(buf)
                _w, _h, fr, _kd = _decode_header(b)
                body = b[HEADER_LEN:]
                if not body:
                    continue
                step = max(len(body) // fr, 1)
                kk = min(k, fr)
                for j in range(kk):
                    fi = j * fr // k if fr >= k else j
                    chunk = body[fi * step:(fi + 1) * step]
                    ids.append(did)
                    slots.append(j)
                    idxs.append(fi)
                    lens.append(len(chunk))
                    hexes.append(chunk.hex().upper())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "slot": pd.Series(slots, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame_hex": pd.Series(hexes, dtype="object"),
                }
            )

    return df.mapInPandas(
        run,
        schema="doc_id long, slot long, frame_idx long, frame_len long, frame_hex string",
    )


# --- real container formats (no codec libs needed) ---------------------------
# PNG / BMP / WAV / GIF carry their core metadata at fixed header offsets,
# parseable from raw bytes alone. This is the REAL half of the multimodal
# story (the pixel/sample DECODE stays stubbed without PIL/ffmpeg): a
# training pipeline's resolution/duration/channel gates need exactly these
# fields and never the pixels.

_CONTAINER_SCHEMA = (
    "fmt string, width int, height int, channels int, sample_rate int, "
    "bit_depth int, n_bytes bigint"
)


def _parse_containers(bufs: list[bytes]) -> pd.DataFrame:
    """Vectorized per-format header parse: one concatenated uint8 view +
    offsets; each format's rows are selected by magic mask and their
    fixed-offset fields gathered with numpy fancy indexing — per-row
    Python never runs."""
    n = len(bufs)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    blob = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(lens[:-1], out=starts[1:])

    fmt = np.full(n, "unknown", dtype=object)
    width = np.full(n, -1, dtype=np.int64)
    height = np.full(n, -1, dtype=np.int64)
    channels = np.full(n, -1, dtype=np.int64)
    rate = np.full(n, -1, dtype=np.int64)
    bits = np.full(n, -1, dtype=np.int64)

    def magic_mask(sig: bytes, at: int, min_len: int) -> np.ndarray:
        m = lens >= max(min_len, at + len(sig))
        safe = np.where(m, starts, 0)
        hi = blob.size - 1
        for i, c in enumerate(sig):
            m &= blob[np.minimum(safe + at + i, hi)] == c
        return m

    def gather(mask: np.ndarray, off: int, nby: int, big: bool) -> np.ndarray:
        # masked rows still get INDEXED by numpy (their values are thrown
        # away), so clamp into range; unmasked rows are in range by the
        # magic_mask min_len guard
        safe = np.where(mask, starts, 0)
        v = np.zeros(n, dtype=np.int64)
        hi = blob.size - 1
        for i in range(nby):
            shift = 8 * ((nby - 1 - i) if big else i)
            v |= blob[np.minimum(safe + off + i, hi)].astype(np.int64) << shift
        return v

    if blob.size:
        png = magic_mask(b"\x89PNG\r\n\x1a\n", 0, 26) & magic_mask(
            b"IHDR", 12, 26
        )
        fmt[png] = "png"
        width[png] = gather(png, 16, 4, big=True)[png]
        height[png] = gather(png, 20, 4, big=True)[png]
        bits[png] = gather(png, 24, 1, big=True)[png]

        bmp = magic_mask(b"BM", 0, 30)
        fmt[bmp] = "bmp"
        width[bmp] = gather(bmp, 18, 4, big=False)[bmp]
        height[bmp] = gather(bmp, 22, 4, big=False)[bmp]
        bits[bmp] = gather(bmp, 28, 2, big=False)[bmp]

        # canonical RIFF/WAVE layout: 'fmt ' chunk directly at offset 12
        wav = magic_mask(b"RIFF", 0, 36) & magic_mask(
            b"WAVE", 8, 36
        ) & magic_mask(b"fmt ", 12, 36)
        fmt[wav] = "wav"
        channels[wav] = gather(wav, 22, 2, big=False)[wav]
        rate[wav] = gather(wav, 24, 4, big=False)[wav]
        bits[wav] = gather(wav, 34, 2, big=False)[wav]

        gif = magic_mask(b"GIF8", 0, 10)
        fmt[gif] = "gif"
        width[gif] = gather(gif, 6, 2, big=False)[gif]
        height[gif] = gather(gif, 8, 2, big=False)[gif]

        osmm = magic_mask(MEDIA_MAGIC, 0, HEADER_LEN)
        fmt[osmm] = "osmm"
        width[osmm] = gather(osmm, 4, 2, big=False)[osmm]
        height[osmm] = gather(osmm, 6, 2, big=False)[osmm]

    return pd.DataFrame(
        {
            "fmt": fmt,
            "width": width.astype(np.int32),
            "height": height.astype(np.int32),
            "channels": channels.astype(np.int32),
            "sample_rate": rate.astype(np.int32),
            "bit_depth": bits.astype(np.int32),
            "n_bytes": lens,
        }
    )


def parse_container_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """binary -> (fmt, width, height, channels, sample_rate, bit_depth,
    n_bytes) for real container formats (PNG, BMP, canonical WAV, GIF) plus
    the OSMM stub; -1 marks fields a format doesn't carry, fmt='unknown'
    for unrecognized buffers (never an exception — gate inputs upstream)."""

    def run(batches):
        for pdf in batches:
            bufs = [bytes(b) if b is not None else b"" for b in pdf[media_col]]
            m = _parse_containers(bufs)
            out = pdf[[c for c in pdf.columns if c != media_col]].reset_index(
                drop=True
            )
            yield pd.concat([out, m], axis=1)

    cols = [f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema.fields if f.name != media_col]
    return df.mapInPandas(run, schema=", ".join(cols + [_CONTAINER_SCHEMA]))


@F.pandas_udf(T.BinaryType())
def _synth_container_udf(doc_id: pd.Series) -> pd.Series:
    """Deterministic REAL containers: even doc_ids get a valid BMP
    (BITMAPINFOHEADER), odd get a canonical WAV — fields derived from
    doc_id by formulas any engine can recompute, so the parse query gets
    an exact cross-engine oracle while exercising true format layouts."""
    import struct

    out = []
    for d in doc_id:
        d = int(d)
        if d % 2 == 0:
            w, h = d % 640 + 1, d % 480 + 1
            body = b"\x00" * (d % 16)
            hdr = struct.pack(
                "<2sIHHIIiiHHIIiiII",
                b"BM", 54 + len(body), 0, 0, 54,
                40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
            )
            out.append(hdr + body)
        else:
            ch = d % 3 + 1
            rate = 8000 + (d % 5) * 4000
            bits = 16
            body = b"\x00" * (d % 16)
            block = ch * bits // 8
            hdr = (
                b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                        rate * block, block, bits)
                + b"data" + struct.pack("<I", len(body))
            )
            out.append(hdr + body)
    return pd.Series(out)


def synth_real_containers(documents: DataFrame) -> DataFrame:
    return documents.withColumn("media", _synth_container_udf(F.col("doc_id")))


def shot_boundaries(
    frames: DataFrame, threshold: int, sig_bits_mod: int = 1 << 60
) -> DataFrame:
    """Shot-boundary detection over sampled frame signatures.

    The video-pipeline step after sample_frames: a cut is declared
    between consecutive sampled frames whose 60-bit content signatures
    differ in >= threshold bits (Hamming distance on a perceptual-hash
    stand-in — here h60 of the frame bytes' hex witness, the same
    deterministic stub discipline as the rest of the multimodal family;
    swap in a real pHash UDF when codecs exist, the plan is unchanged).

    Input: sample_frames output (doc_id, slot, frame_hex). Output one
    row per doc with >= 1 sampled frame: n_frames, n_shots (= boundary
    count + 1), max_ham (0 for single-frame docs), bslots (sum of
    boundary slot ids — pins WHERE the cuts landed, not just how many).

    Plan: one window (lag over slot per doc) + one hash aggregate, all
    JVM — bitwiseXOR + bit_count stay in codegen. 100 TB posture: the
    only shuffle key is doc_id; state is lag-1.
    """
    from osm_hadoop_spark.operators.textstats import h60
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("slot")
    sig = (h60(F.col("frame_hex")) % sig_bits_mod).alias("sig")
    lagged = frames.select("doc_id", "slot", sig).withColumn(
        "ps", F.lag("sig").over(w)
    )
    ham = F.when(
        F.col("ps").isNull(), F.lit(None).cast("bigint")
    ).otherwise(F.bit_count(F.col("sig").bitwiseXOR(F.col("ps"))).cast("bigint"))
    per = lagged.select("doc_id", "slot", ham.alias("ham"))
    is_cut = (F.col("ham") >= int(threshold)).cast("bigint")
    return per.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        (F.sum(F.coalesce(is_cut, F.lit(0))) + 1).cast("bigint").alias("n_shots"),
        F.coalesce(F.max("ham"), F.lit(0)).cast("bigint").alias("max_ham"),
        F.sum(
            F.when(F.coalesce(is_cut, F.lit(0)) == 1, F.col("slot")).otherwise(0)
        )
        .cast("bigint")
        .alias("bslots"),
    )
