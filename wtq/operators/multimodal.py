"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` (the pattern a training-data pipeline needs at 100 TB:
binary stays off the driver, batches stream through Python workers).

Two tiers:

* **Real codec path** — binary P6 PPM encode/decode in pure numpy
  (``encode_ppm``/``decode_ppm``): genuine byte-level image decode,
  block-mean resize, per-channel statistics, all oracle-checked
  against a closed-form SQL derivation (``image_features``).  PNG
  encode/decode is also REAL (``encode_png``/``decode_png``): stdlib
  zlib inflate + all five scanline filters (None/Sub/Up/Average/
  Paeth) + CRC verification, gray/RGB/RGBA at bit depth 8 — no
  external codec needed.  This is the full decode → transform →
  featurize shape a training pipeline runs.
* **Baseline JPEG** (round 5, ``wtq/operators/jpeg.py``) — sequential
  DCT decode AND encode (Huffman entropy coding, 4:2:0/4:4:4,
  restart markers, byte stuffing), spec-validated via closed-form
  known-answer bitstreams + round-trip property tests.  Unsupported
  processes (progressive/arithmetic/12-bit) raise into the
  quarantine path.  ``extract_features`` uses a deterministic
  hash-derived stand-in embedding so the plumbing stays testable
  without model weights.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 4
IMG_W = 16
IMG_H = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        # first feature kept at full double precision for the oracle
        # check (the float32 embedding would lose digits vs SQL)
        T.StructField("f0", T.DoubleType()),
    ]
)


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_image(blob: bytes):
    """Format-dispatching image decode: PNG, binary P6 PPM, and
    baseline JPEG all decode for REAL (pure stdlib + numpy).  JPEG
    (wtq/operators/jpeg.py, round 5) is validated against the SPEC —
    closed-form known-answer bitstreams plus a full-surface round-trip
    property — rather than a reference codec (none exists in this
    container); unsupported JPEG processes (progressive, arithmetic,
    12-bit) raise ValueError into the quarantine path rather than
    risking silently wrong rasters.  The pipeline takes the decode
    function as a seam, so swapping in e.g. libjpeg-turbo is one
    argument."""
    if blob[:8] == PNG_SIG:
        return decode_png(blob)
    if blob[:2] == b"P6":
        return decode_ppm(blob)
    if blob[:2] == b"\xff\xd8":
        from wtq.operators.jpeg import decode_jpeg

        return decode_jpeg(blob)
    raise ValueError("unrecognized image container")


# ---------------------------------------------------------------------------
# Real codec: PNG (stdlib zlib + numpy; bit depth 8, gray/RGB/RGBA)
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale, (h, w, 3) RGB, or (h, w, 4) RGBA →
    PNG bytes (filter 0 per scanline, one zlib-deflated IDAT)."""
    import struct
    import zlib

    assert arr.dtype == np.uint8
    if arr.ndim == 2:
        color_type, channels = 0, 1
        h, w = arr.shape
    else:
        h, w, channels = arr.shape
        color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = arr.reshape(h, w * channels)
    scanlines = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> np.ndarray:
    """PNG → uint8 raster ((h, w) for grayscale, (h, w, c) otherwise).

    Real decode, no external codec: chunk walk with CRC verification,
    stdlib-zlib inflate of the concatenated IDAT stream, then scanline
    unfiltering for ALL five filter types (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth — the per-row reconstruction loop is the
    format's inherent sequential dependency).  Supported: bit depth 8,
    color types 0 (gray), 2 (RGB), 6 (RGBA), no interlace.  Malformed
    input raises ValueError — the quarantine path's contract."""
    import struct
    import zlib

    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(blob):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG variant (need depth 8, no interlace)")
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up — vectorizable, no intra-row dependency
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + int(prev[x])) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    pred = _paeth(a, int(prev[x]), c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    arr = out.reshape(h, w, channels)
    return arr[:, :, 0] if channels == 1 else arr


# ---------------------------------------------------------------------------
# Real codec: binary P6 PPM (pure numpy — no external library)
# ---------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) → binary P6 PPM bytes."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _decode_ppm_at(blob: bytes, offset: int) -> tuple[np.ndarray, int]:
    """Decode one P6 frame starting at `offset`; returns (raster,
    offset past the frame) so multi-frame streams can be walked."""
    if blob[offset : offset + 2] != b"P6":
        raise ValueError("not a binary P6 PPM")
    fields: list[int] = []
    i = offset + 2
    while len(fields) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(blob) and blob[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        fields.append(int(blob[i:j]))
        i = j
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    i += 1  # single whitespace byte after maxval
    raster = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3), i + w * h * 3


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary P6 PPM bytes → uint8 (h, w, 3).  A real byte-level
    decoder: parses the magic + whitespace-separated header fields
    (comments included), then reinterprets the raster."""
    arr, _ = _decode_ppm_at(blob, 0)
    return arr


def block_mean_resize(arr: np.ndarray, factor: int = 2) -> np.ndarray:
    """Downsample by integer factor via exact block means (float64)."""
    h, w, c = arr.shape
    return (
        arr.astype(np.float64)
        .reshape(h // factor, factor, w // factor, factor, c)
        .mean(axis=(1, 3))
    )


def synth_image(doc_id: int, w: int = IMG_W, h: int = IMG_H) -> np.ndarray:
    """Deterministic test image: pixel value at (x, y, c) =
    (doc_id·31 + x·7 + y·13 + c·101) mod 256 — closed-form, so the SQL
    oracle can derive every feature from integer arithmetic alone."""
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((doc_id * 31 + x * 7 + y * 13 + c * 101) % 256).astype(np.uint8)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("small_px0_r", T.DoubleType()),
    ]
)


# ---------------------------------------------------------------------------
# Video analog: multi-frame PPM stream + frame sampling
# ---------------------------------------------------------------------------

VIDEO_FRAMES = 8
FRAME_STEP = 3  # sample frames 0, 3, 6


def encode_video(frames: list[np.ndarray]) -> bytes:
    return b"".join(encode_ppm(f) for f in frames)


def iter_video_frames(blob: bytes):
    """Walk a concatenated-PPM stream frame by frame (real parsing —
    each frame's length comes from its own header, not assumed)."""
    off = 0
    while off < len(blob):
        frame, off = _decode_ppm_at(blob, off)
        yield frame


def synth_video(doc_id: int, n_frames: int = VIDEO_FRAMES) -> list[np.ndarray]:
    return [synth_image(doc_id * n_frames + f) for f in range(n_frames)]


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sampled_mean_r", T.DoubleType()),
    ]
)


def video_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling over a multi-frame binary stream: decode ALL
    frame headers (to count), decode every FRAME_STEP-th raster, mean
    the R channel across sampled frames — the decode-what-you-sample
    shape of video training-data prep."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id),) + _video_feature_row(int(doc_id))
                for doc_id in pdf[id_col]
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FEATURES_SCHEMA.fields])

    return df.select(F.col(id_col)).mapInPandas(run, VIDEO_FEATURES_SCHEMA)


def _video_feature_row(doc_id: int) -> tuple:
    """(n_frames, sampled_mean_r) — the ONE definition of the video
    features, shared by video_features and media_features so the two
    paths cannot drift."""
    frames = list(iter_video_frames(encode_video(synth_video(doc_id))))
    sampled = frames[::FRAME_STEP]
    mean_r = float(np.mean([f[:, :, 0].astype(np.float64).mean() for f in sampled]))
    return (len(frames), round(mean_r, 6))


def sql_video_features(table: str, id_col: str = "doc_id") -> str:
    """Closed-form oracle: mean of per-frame means over sampled frames
    f ∈ {0, 3, 6}; all sums integral until the final divisions."""
    sampled = list(range(0, VIDEO_FRAMES, FRAME_STEP))
    px = f"(({id_col} * {VIDEO_FRAMES} + f) * 31 + x * 7 + y * 13) % 256"
    frames = ", ".join(str(f) for f in sampled)
    return f"""
    WITH px AS (
      SELECT {id_col} AS doc_id, {px} AS v
      FROM {table}
      CROSS JOIN (SELECT unnest([{frames}]) AS f)
      CROSS JOIN (SELECT unnest(range(0, {IMG_W})) AS x)
      CROSS JOIN (SELECT unnest(range(0, {IMG_H})) AS y)
    )
    SELECT doc_id, {VIDEO_FRAMES} AS n_frames,
           round(CAST(sum(v) AS BIGINT) / {len(sampled) * IMG_W * IMG_H}.0, 6) AS sampled_mean_r
    FROM px GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# Real codec: RIFF/PCM16 WAV (pure numpy + struct — no external library)
# ---------------------------------------------------------------------------

AUDIO_N = 256
AUDIO_RATE = 8000


def encode_wav(samples: np.ndarray, rate: int = AUDIO_RATE) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes."""
    import struct

    assert samples.dtype == np.int16
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → (int16 samples, sample_rate).  A real
    chunk-walking decoder: verifies the RIFF/WAVE magic, iterates
    chunks (skipping unknown ones), reads fmt, then reinterprets the
    data payload."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, rate, samples = 12, None, None
    while i + 8 <= len(blob):
        cid = blob[i : i + 4]
        (size,) = struct.unpack("<I", blob[i + 4 : i + 8])
        body = blob[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only 16-bit mono PCM supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype=np.int16)
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return samples, rate


def synth_audio(doc_id: int, n: int = AUDIO_N) -> np.ndarray:
    """Deterministic test signal: s[i] = (doc_id·7919 + i·2654435761)
    mod 65536 − 32768 — closed-form for the SQL oracle."""
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 7919 + i * 2654435761) % 65536 - 32768).astype(np.int16)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode → DECODE (real RIFF chunk walk) → featurize in one
    mapInPandas pass.  RMS is derived from the exact INTEGER sum of
    squares (order-independent, so both engines agree bit-for-bit
    before the one double sqrt/divide)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id),) + _audio_feature_row(int(doc_id))
                for doc_id in pdf[id_col]
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.select(F.col(id_col)).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def _audio_feature_row(doc_id: int) -> tuple:
    """(n_samples, duration_ms, rms, zero_crossings) — the ONE
    definition of the audio features, shared by audio_features and
    media_features."""
    s, rate = decode_wav(encode_wav(synth_audio(doc_id)))
    v = s.astype(np.int64)
    sum_sq = int((v * v).sum())
    zc = int(((v[:-1] * v[1:]) < 0).sum())
    return (
        len(s),
        len(s) * 1000 // rate,
        round(float(np.sqrt(sum_sq / float(len(s)))), 6),
        zc,
    )


def sql_audio_features(table: str, id_col: str = "doc_id") -> str:
    """Closed-form oracle over the signal formula — integer sums only,
    then one double sqrt, so no float-order divergence is possible."""
    v = f"(({id_col} * 7919 + i * 2654435761) % 65536 - 32768)"
    return f"""
    WITH s AS (
      SELECT {id_col} AS doc_id, i, {v} AS v
      FROM {table}
      CROSS JOIN (SELECT unnest(range(0, {AUDIO_N})) AS i)
    ),
    lagged AS (
      SELECT doc_id, v, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM s
    )
    SELECT doc_id,
           {AUDIO_N} AS n_samples,
           {AUDIO_N * 1000 // AUDIO_RATE} AS duration_ms,
           round(sqrt(CAST(sum(v * v) AS BIGINT) / {AUDIO_N}.0), 6) AS rms,
           CAST(sum(CASE WHEN pv IS NOT NULL AND pv * v < 0 THEN 1 ELSE 0 END) AS INT) AS zero_crossings
    FROM lagged GROUP BY doc_id
    """


def image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode → DECODE (real PPM parse) → resize → featurize, all
    inside one mapInPandas pass; binary never touches the driver.
    Features: dimensions, per-channel means of the decoded raster, and
    the top-left pixel of the 2× block-mean resize (channel R)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id),) + _image_feature_row(int(doc_id))
                for doc_id in pdf[id_col]
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.select(F.col(id_col)).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def _image_feature_row(doc_id: int) -> tuple:
    """(width, height, mean_r, mean_g, mean_b, small_px0_r) — the ONE
    definition of the image features, shared by image_features and
    media_features."""
    img = decode_ppm(encode_ppm(synth_image(doc_id)))
    h, w, _ = img.shape
    means = img.astype(np.float64).mean(axis=(0, 1))
    small = block_mean_resize(img)
    return (
        w, h,
        round(float(means[0]), 6),
        round(float(means[1]), 6),
        round(float(means[2]), 6),
        round(float(small[0, 0, 0]), 6),
    )


def sql_image_features(table: str, id_col: str = "doc_id") -> str:
    """Closed-form oracle: re-derives every feature from the pixel
    formula with integer arithmetic over unnested coordinate ranges —
    no image bytes involved, so a decoder bug cannot self-confirm."""
    px = f"(({id_col} * 31 + x * 7 + y * 13 + c * 101) % 256)"
    return f"""
    WITH px AS (
      SELECT {id_col} AS doc_id, x, y, c, {px} AS v
      FROM {table}
      CROSS JOIN (SELECT unnest(range(0, {IMG_W})) AS x)
      CROSS JOIN (SELECT unnest(range(0, {IMG_H})) AS y)
      CROSS JOIN (SELECT unnest(range(0, 3)) AS c)
    ),
    means AS (
      SELECT doc_id,
             round(sum(CASE WHEN c = 0 THEN v ELSE 0 END) / {IMG_W * IMG_H}.0, 6) AS mean_r,
             round(sum(CASE WHEN c = 1 THEN v ELSE 0 END) / {IMG_W * IMG_H}.0, 6) AS mean_g,
             round(sum(CASE WHEN c = 2 THEN v ELSE 0 END) / {IMG_W * IMG_H}.0, 6) AS mean_b,
             round(sum(CASE WHEN c = 0 AND x < 2 AND y < 2 THEN v ELSE 0 END) / 4.0, 6) AS small_px0_r
      FROM px GROUP BY doc_id
    )
    SELECT doc_id, {IMG_W} AS width, {IMG_H} AS height,
           mean_r, mean_g, mean_b, small_px0_r
    FROM means
    """


SAFE_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("err", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
    ]
)


def image_features_safe(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Decode with a QUARANTINE path: a malformed blob (truncated
    raster, garbage magic, corrupt header) produces an (ok=false, err)
    row instead of failing the task — the err_all pattern applied to
    decode errors.  At 100 TB a daily run WILL hit corrupt blobs; one
    bad record must never kill a 10-hour job.  Conservation contract:
    every input row appears exactly once (good + quarantined = input),
    pinned by tests/test_rules_unit.py.

    Decode goes through the format-dispatching seam (`decode_image`),
    so PPM, PNG, and baseline JPEG blobs all extract for real in one
    pass and anything else (corrupt data, progressive JPEG, unknown
    containers) quarantines instead of crashing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                doc_id = int(doc_id)
                try:
                    img = decode_image(bytes(blob))
                    if img.ndim == 2:  # grayscale → single-channel raster
                        img = img[:, :, None]
                    h, w, _ = img.shape
                    mean_r = round(float(img[:, :, 0].astype(np.float64).mean()), 6)
                    rows.append((doc_id, True, None, w, h, mean_r))
                except Exception as e:  # noqa: BLE001 — quarantine, never crash the task
                    rows.append((doc_id, False, f"{type(e).__name__}: {e}"[:200], None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in SAFE_IMAGE_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(run, SAFE_IMAGE_SCHEMA)


def quarantine_split(features: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) from a *_safe feature frame."""
    return features.filter(F.col("ok")), features.filter(~F.col("ok"))


MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("small_px0_r", T.DoubleType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sampled_mean_r", T.DoubleType()),
    ]
)


def media_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """All three real-codec decode paths (P6 PPM image, RIFF/PCM16 WAV
    audio, multi-frame PPM video stream) in ONE mapInPandas pass — one
    Python worker round-trip per batch instead of three, one wide row
    per document.  Consolidates the former image_features /
    audio_features / video_features registry demos (50-entry driver
    cap); the per-modality operators remain the public API and are
    pytest-gated against the same closed-form oracles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id),)
                + _image_feature_row(int(doc_id))
                + _audio_feature_row(int(doc_id))
                + _video_feature_row(int(doc_id))
                for doc_id in pdf[id_col]
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA.fields])

    return df.select(F.col(id_col)).mapInPandas(run, MEDIA_FEATURES_SCHEMA)


def sql_media_features(table: str, id_col: str = "doc_id") -> str:
    """Joined closed-form oracle: each modality's features re-derived
    independently from the synthetic formulas (never from the bytes),
    joined on doc_id — a decoder bug in ANY path cannot self-confirm."""
    return f"""
    WITH img AS ({sql_image_features(table, id_col)}),
         aud AS ({sql_audio_features(table, id_col)}),
         vid AS ({sql_video_features(table, id_col)})
    SELECT img.doc_id, img.width, img.height, img.mean_r, img.mean_g, img.mean_b,
           img.small_px0_r, aud.n_samples, aud.duration_ms, aud.rms,
           aud.zero_crossings, vid.n_frames, vid.sampled_mean_r
    FROM img JOIN aud USING (doc_id) JOIN vid USING (doc_id)
    """


def _fake_embed(blob: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-content feature vector."""
    h = hashlib.sha256(blob).digest()
    return [int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(FEATURE_DIM)]


def with_blob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in 'media' table: payload bytes + metadata struct."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).alias("n_chars"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": blobs.map(len).astype("int32"),
                    "content_sha256": blobs.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "embedding": blobs.map(_fake_embed),
                    "f0": blobs.map(lambda b: _fake_embed(bytes(b))[0]),
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def multimodal_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    feats = extract_features(with_blob(df, id_col, text_col))
    return feats.select(
        "doc_id",
        "byte_len",
        "content_sha256",
        F.round("f0", 6).alias("f0"),
    )


def sql_multimodal_features(table: str, id_col: str, text_col: str) -> str:
    """Oracle for the SQL-expressible part (byte length + sha256 of
    the payload); the fake embedding's first component is
    sha256-derived so it is oracle-checkable too."""
    return f"""
    SELECT {id_col} AS doc_id,
           CAST(octet_length(encode({text_col})) AS INT) AS byte_len,
           sha256({text_col}) AS content_sha256,
           round(CAST(('0x' || substr(sha256({text_col}), 1, 8)) AS BIGINT) / 4294967296.0, 6) AS f0
    FROM {table}
    """
