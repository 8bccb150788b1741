"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, partitioning, mapInPandas batch
shapes, metadata extraction, frame sampling plan) AND the container
formats are real: ``decode_image`` is a from-scratch PNG decoder
(zlib inflate + full filter reconstruction, RFC 2083), ``decode_audio``
a from-scratch RIFF/WAVE PCM decoder, and ``image_dimensions`` parses
PNG/JPEG/GIF headers at the struct level — no imaging library needed.
Codec-compressed formats (JPEG entropy decode, MP4/H.264) are
deliberately out of scope for pixel decode and raise ``ValueError``
(unsupported format — a real error path, not a stub); their
dimensions/metadata still parse.

Pattern at 100 TB: media bytes stay in their own column/files; all
shuffles move (id, metadata, features), never the bytes — only the
feature-extract / header-probe stages scan the binary column, via
mapInPandas with small Arrow batches (wrap the action in
``arrow_batch_rows`` so ``spark.sql.execution.arrow.maxRecordsPerBatch``
is tuned down WHILE the query runs and a batch of images fits executor
memory).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator
from contextlib import contextmanager

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 64

# ---------------- PNG (RFC 2083, struct-level, no library) ----------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """Minimal compliant PNG writer: 8-bit, grayscale / gray+alpha /
    RGB / RGBA by channel count, filter type 0 on every scanline, no
    interlace. Used to synthesize REAL image payloads for the fake
    media generator so the decode path is exercised end-to-end."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _png_chunks(payload: bytes) -> Iterator[tuple[bytes, bytes]]:
    i = len(_PNG_SIG)
    n = len(payload)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", payload[i : i + 4])
        tag = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        yield tag, data
        i += 12 + length  # length + tag + data + crc
        if tag == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to an (H, W, C) uint8 array — from-scratch
    implementation: zlib inflate of the IDAT stream, then scanline
    filter reconstruction (None/Sub/Up/Average/Paeth) and palette
    expansion. Supports the writer-relevant profile: bit depth 8, no
    interlace, color types 0/2/3/4/6. Non-PNG and JPEG payloads raise
    ValueError (JPEG entropy decode is out of scope; use
    ``image_dimensions`` for its header metadata)."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (only PNG pixel decode is supported)")
    ihdr = None
    palette = None
    idat = bytearray()
    try:
        for tag, data in _png_chunks(payload):
            if tag == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif tag == b"PLTE":
                palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            elif tag == b"IDAT":
                idat.extend(data)
    except struct.error as ex:
        raise ValueError(f"PNG structure corrupt: {ex}") from ex
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG profile (depth={depth}, color_type={color_type}, "
            f"interlace={interlace}); decoder supports 8-bit non-interlaced"
        )
    channels = _PNG_CHANNELS[color_type]
    stride = w * channels
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as ex:
        raise ValueError(f"PNG IDAT stream corrupt: {ex}") from ex
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up — vectorizable
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - channels] if x >= channels else 0
                if ftype == 1:
                    rec[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
                else:
                    c = prev[x - channels] if x >= channels else 0
                    rec[x] = (line[x] + _paeth(a, int(prev[x]), int(c))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    img = out.reshape(h, w, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("paletted PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


# ------------- JPEG / GIF / PNG header dimension parsers -------------

# SOF markers carrying frame dimensions: 0xC0-0xCF minus DHT/JPG/DAC
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def jpeg_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the first SOFn frame header — pure marker
    walk (ITU T.81 B.2), no entropy decode."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
            i += 2 if marker != 0xFF else 1
            continue
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if marker in _JPEG_SOF:
            if i + 9 > n:
                break
            height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
            return width, height
        i += 2 + seglen
    raise ValueError("JPEG has no SOF frame header")


def image_dimensions(payload: bytes) -> tuple[str, int, int]:
    """(format, width, height) parsed from the container header —
    PNG (IHDR), JPEG (SOFn), or GIF (logical screen descriptor).
    Struct-level reads only; never decodes pixels."""
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h
    if payload[:2] == b"\xff\xd8":
        w, h = jpeg_dimensions(payload)
        return "jpeg", w, h
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h
    raise ValueError("unrecognized image container (PNG/JPEG/GIF supported)")


# ---------------- RIFF/WAVE PCM (struct-level, no library) ----------------


def wav_encode(
    samples: np.ndarray, sample_rate: int = 8000
) -> bytes:
    """Minimal RIFF/WAVE writer: PCM16, mono (1-D) or multi-channel
    (2-D ``(n, ch)``), little-endian. Input float in [-1, 1] or int16."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.dtype.kind == "f":
        arr = np.clip(np.round(arr * 32767.0), -32768, 32767)
    arr = arr.astype("<i2")
    n, ch = arr.shape
    data = arr.tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_info(payload: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, n_channels, n_samples, duration_ms) from the
    RIFF chunk walk — no sample decode."""
    fmt, data_len = _wav_chunks(payload)
    audio_format, ch, rate, _byte_rate, block_align, bits = fmt
    if block_align == 0:
        raise ValueError("WAV block_align is zero")
    n_samples = data_len // block_align
    return rate, ch, n_samples, int(round(n_samples * 1000.0 / rate))


def _wav_chunks(payload: bytes) -> tuple[tuple, int]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    n = len(payload)
    fmt = None
    data_len = None
    while i + 8 <= n:
        tag = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if tag == b"fmt ":
            chunk = payload[i + 8 : i + 24]
            if len(chunk) < 16:  # documented error type, not struct.error
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", chunk)
        elif tag == b"data":
            data_len = min(size, n - i - 8)
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt/data chunk")
    return fmt, data_len


def decode_audio(payload: bytes) -> np.ndarray:
    """Decode a RIFF/WAVE payload to float32 samples in [-1, 1],
    shape (n_samples, n_channels) — from-scratch chunk walk + PCM
    conversion. Supports PCM 8 (unsigned) / 16 / 24 / 32-bit and
    IEEE float 32/64. Compressed codecs raise ValueError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload (only WAV decode is supported)")
    i = 12
    n = len(payload)
    fmt = None
    data = None
    while i + 8 <= n:
        tag = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if tag == b"fmt ":
            chunk = payload[i + 8 : i + 24]
            if len(chunk) < 16:  # documented error type, not struct.error
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", chunk)
        elif tag == b"data":
            data = payload[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, _rate, _byte_rate, _block_align, bits = fmt
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3)
            x = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(
                1 << 23
            )
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(data, dtype=dt).astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV audio format {audio_format}")
    if ch > 1:
        x = x[: (len(x) // ch) * ch].reshape(-1, ch)
    else:
        x = x.reshape(-1, 1)
    return x


def deterministic_fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Stand-in feature extractor: sha256(content)-seeded unit vector.
    Deterministic in the BYTES, so tests exercise the full distributed
    path with stable outputs."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little") % (2**32 - 1)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / (np.linalg.norm(v) + 1e-8)


def media_metadata(media: DataFrame) -> DataFrame:
    """Cheap metadata pass — JVM-side only, never ships bytes to Python."""
    return media.select(
        "media_id",
        "kind",
        "mime",
        F.length("payload").alias("n_bytes"),
        F.md5(F.col("payload")).alias("content_md5"),
        "width",
        "height",
        "duration_ms",
    )


@contextmanager
def arrow_batch_rows(spark, batch_rows: int):
    """Scope ``spark.sql.execution.arrow.maxRecordsPerBatch`` around an
    ACTION.  Spark reads this conf at query execution time, so setting
    it while merely BUILDING a lazy plan (the old pattern here) was a
    no-op — wrap the ``.collect()`` / ``.write`` / ``.toPandas()`` that
    actually scans media bytes:

        with arrow_batch_rows(spark, 64):
            feats.collect()
    """
    cfg = spark.conf
    old = cfg.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    cfg.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    try:
        yield
    finally:
        cfg.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(media_id, features: array<float>): mapInPandas over the binary
    column (the only stage that touches bytes).  Batch-size memory
    bounding is the CALLER's action-scope concern: wrap the action in
    ``arrow_batch_rows(spark, n)`` — a conf set at plan-build time does
    not survive to execution."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                deterministic_fake_features(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, features array<float>"
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """(media_id, frame_idx, ts_ms): the frame-sampling PLAN for video
    rows — pure JVM arithmetic; the decode of each sampled frame would
    plug into extract_features."""
    v = media.filter(F.col("kind") == "video")
    n = F.least(
        F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return v.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
        "duration_ms",
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("ts_ms"),
    )


def fake_media_row(seed: int, i: int) -> dict:
    """One deterministic fake-media row (pure Python, no Spark):
    payload bytes derived from (seed, id) via Philox so any caller —
    the distributed generator below or a driver-side expectation
    builder — reproduces identical bytes for the same id."""
    rng = np.random.Generator(np.random.Philox(key=[seed, int(i)]))
    kind = ["image", "audio", "video"][int(i) % 3]
    if kind == "image":
        w = int(rng.integers(4, 33))
        h = int(rng.integers(4, 33))
        payload = png_encode(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        dur = 0
    elif kind == "audio":
        rate = 8000
        n_samp = int(rng.integers(80, 800))
        payload = wav_encode(rng.uniform(-1, 1, size=n_samp).astype(np.float32), rate)
        w = h = 0
        dur = int(round(n_samp * 1000.0 / rate))
    else:
        payload = rng.bytes(int(rng.integers(200, 2000)))
        w = int(rng.integers(64, 1920))
        h = int(rng.integers(64, 1080))
        dur = int(rng.integers(1000, 60000))
    return {
        "media_id": int(i),
        "kind": kind,
        "payload": payload,
        "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        "width": w,
        "height": h,
        "duration_ms": dur,
    }


def generate_fake_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench: payload bytes
    derived from the id (content-addressable, like real media).
    Image rows are REAL PNGs (random small RGB via ``png_encode``) and
    audio rows REAL PCM16 WAVs (``wav_encode``), so the from-scratch
    decoders and header parsers run against genuine containers;
    video rows stay opaque bytes (MP4 decode is out of scope) with
    declared metadata only."""
    cols = ["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"]

    def gen(batches):
        import pyarrow as pa

        out_schema = pa.schema(
            [
                ("media_id", pa.int64()),
                ("kind", pa.string()),
                ("payload", pa.binary()),
                ("mime", pa.string()),
                ("width", pa.int32()),
                ("height", pa.int32()),
                ("duration_ms", pa.int32()),
            ]
        )
        for batch in batches:
            ids = batch.column("id").to_numpy()
            rows = {k: [] for k in cols}
            for i in ids:
                row = fake_media_row(seed, int(i))
                for k in cols:
                    rows[k].append(row[k])
            yield pa.RecordBatch.from_pydict(rows, schema=out_schema)

    return spark.range(0, n).mapInArrow(gen, MEDIA_SCHEMA)


def expected_media_pipeline(
    n: int, seed: int = 42, every_ms: int = 1000, max_frames: int = 16
) -> pd.DataFrame:
    """Driver-side ground-truth mirror of the full media pipeline over
    the deterministic fake corpus: regenerates each payload locally
    (``fake_media_row``), then computes declared metadata, md5 digest,
    header parse (same codecs, invoked as plain functions), the
    sha256-seeded feature sqnorm, and the frame-plan count — WITHOUT
    Spark.  Materialized to parquet as the DuckDB oracle for
    ``media_pipeline``, turning its rows-only check into a value check
    of the distributed path (Arrow batching, mapInPandas decode, JVM
    metadata, joins) against an independently-executed local
    reference."""
    out: dict[str, list] = {
        k: []
        for k in [
            "media_id", "kind", "mime", "n_bytes", "content_md5",
            "width", "height", "duration_ms", "feat_sqnorm", "fmt",
            "parsed_width", "parsed_height", "parsed_duration_ms",
            "header_ok", "n_frames",
        ]
    }
    for i in range(n):
        row = fake_media_row(seed, i)
        payload = row["payload"]
        # unparseable/opaque rows use sentinels (-1 / 'raw'), not NULL:
        # nullable ints materialize as float64 in pandas on either side
        # of the driver's dtype-sensitive compare, so the contract
        # query coalesces the same way.
        fmt, w, h, dur = "raw", -1, -1, -1
        ok = False
        try:
            if row["kind"] == "image":
                fmt, w, h = image_dimensions(payload)
                ok = True
            elif row["kind"] == "audio":
                _rate, _ch, _nsamp, dur = wav_info(payload)
                fmt = "wav"
                ok = True
        except (ValueError, struct.error):
            pass
        feats = deterministic_fake_features(payload)
        n_frames = 0
        if row["kind"] == "video":
            n_frames = min(max(row["duration_ms"] // every_ms, 1), max_frames)
        out["media_id"].append(row["media_id"])
        out["kind"].append(row["kind"])
        out["mime"].append(row["mime"])
        out["n_bytes"].append(len(payload))
        out["content_md5"].append(hashlib.md5(payload).hexdigest())
        out["width"].append(row["width"])
        out["height"].append(row["height"])
        out["duration_ms"].append(row["duration_ms"])
        # sequential left-fold in float64, exactly Spark's F.aggregate
        acc = 0.0
        for x in feats.tolist():
            acc += x * x
        out["feat_sqnorm"].append(round(acc, 3))
        out["fmt"].append(fmt)
        out["parsed_width"].append(w)
        out["parsed_height"].append(h)
        out["parsed_duration_ms"].append(dur)
        out["header_ok"].append(ok)
        out["n_frames"].append(n_frames)
    pdf = pd.DataFrame(out)
    for c in (
        "width", "height", "duration_ms",
        "parsed_width", "parsed_height", "parsed_duration_ms", "n_bytes",
    ):
        pdf[c] = pdf[c].astype("int32")
    pdf["n_frames"] = pdf["n_frames"].astype("int64")
    return pdf


def parse_media_headers(media: DataFrame) -> DataFrame:
    """(media_id, kind, fmt, parsed_width, parsed_height,
    parsed_duration_ms, header_ok): struct-level container probe over
    the binary column — PNG/JPEG/GIF dimensions, WAV duration —
    via mapInPandas (same byte-scanning stage discipline as
    ``extract_features``: bytes never shuffle, only the parsed
    metadata comes back; wrap the ACTION in ``arrow_batch_rows`` to
    bound batch memory). Rows whose payload doesn't parse
    (e.g. the opaque video fakes) come back header_ok=false with null
    fields — the quarantine signal a 100 TB ingest uses to route
    corrupt/unsupported media out of the pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "fmt": [],
                "parsed_width": [],
                "parsed_height": [],
                "parsed_duration_ms": [],
                "header_ok": [],
            }
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                fmt = w = h = dur = None
                ok = False
                try:
                    if kind == "image":
                        fmt, w, h = image_dimensions(bytes(payload))
                        ok = True
                    elif kind == "audio":
                        _rate, _ch, _n, dur = wav_info(bytes(payload))
                        fmt = "wav"
                        ok = True
                except (ValueError, struct.error):
                    pass
                out["fmt"].append(fmt)
                out["parsed_width"].append(w)
                out["parsed_height"].append(h)
                out["parsed_duration_ms"].append(dur)
                out["header_ok"].append(ok)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run,
        "media_id long, kind string, fmt string, parsed_width int, "
        "parsed_height int, parsed_duration_ms int, header_ok boolean",
    )


def media_exact_dedup(media: DataFrame) -> DataFrame:
    """(media_id, canonical, is_canonical, n_copies): byte-exact media
    deduplication — the image/audio analogue of the text pipeline's
    ``exact_dedup``, and the one media dedup that needs NO decoder:
    content identity is sha256 over the raw payload, computed JVM-side
    (``F.sha2``), so the binary column never crosses into Python and
    never shuffles — only (media_id, digest) pairs move. Canonical =
    min media_id per digest (the survivor rule the text family uses).

    At 100 TB this is the first stage of every image-dedup pipeline
    (LAION/DataComp dedup starts with exact-bytes): one combinable
    hash agg keyed by digest; perceptual near-dup then runs over
    ``extract_features`` vectors via the unchanged
    ``dedup.embedding_near_dup`` + ``dedup_clusters`` machinery (with
    a real decoder wired, those features become pHash/CLIP — the
    Spark plan is final either way)."""
    digests = media.select(
        "media_id", F.sha2(F.col("payload"), 256).alias("digest")
    )
    canon = digests.groupBy("digest").agg(
        F.min("media_id").alias("canonical"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return (
        digests.join(canon, "digest")
        .select(
            "media_id",
            "canonical",
            (F.col("media_id") == F.col("canonical")).alias("is_canonical"),
            "n_copies",
        )
        .orderBy("media_id")
    )
