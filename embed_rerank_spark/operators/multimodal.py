"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery is REAL and tested (schemas, partitioning,
mapInPandas batch shapes, metadata extraction, frame sampling plan);
the actual media decoding is STUBBED — the decode libraries are not in
this container — behind ``deterministic_fake_features`` (a seeded,
content-keyed fake) and ``decode_image``/``decode_audio`` raising
``NotImplementedError`` with the library they would use.

Pattern at 100 TB: media bytes stay in their own column/files; all
shuffles move (id, metadata, features), never the bytes — only the
feature-extract stage scans the binary column, via mapInPandas with
small Arrow batches (``spark.sql.execution.arrow.maxRecordsPerBatch``
tuned down so a batch of images fits executor memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 64


def decode_image(payload: bytes) -> "np.ndarray":
    raise NotImplementedError(
        "image decode requires Pillow/libvips (not in this container); "
        "wire the real decoder here — the Spark plumbing around it is final"
    )


def decode_audio(payload: bytes) -> "np.ndarray":
    raise NotImplementedError(
        "audio decode requires soundfile/ffmpeg (not in this container)"
    )


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


def extract_features(
    media: DataFrame, dim: int = FEATURE_DIM, batch_rows: int = 64
) -> DataFrame:
    """(media_id, features: array<float>): mapInPandas over the binary
    column in small batches (the only stage that touches bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                deterministic_fake_features(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    cfg = media.sparkSession.conf
    old = cfg.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    cfg.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    try:
        out = media.select("media_id", "payload").mapInPandas(
            run, "media_id long, features array<float>"
        )
    finally:
        cfg.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    return out


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


def generate_fake_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench: payload bytes
    derived from the id (content-addressable, like real media)."""
    kinds = ["image", "audio", "video"]

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
            rows = {k: [] for k in ["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"]}
            for i in ids:
                rng = np.random.Generator(np.random.Philox(key=[seed, int(i)]))
                kind = kinds[int(i) % 3]
                payload = rng.bytes(int(rng.integers(200, 2000)))
                rows["media_id"].append(int(i))
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
                rows["width"].append(int(rng.integers(64, 1920)) if kind != "audio" else 0)
                rows["height"].append(int(rng.integers(64, 1080)) if kind != "audio" else 0)
                rows["duration_ms"].append(int(rng.integers(1000, 60000)) if kind != "image" else 0)
            yield pa.RecordBatch.from_pydict(rows, schema=out_schema)

    return spark.range(0, n).mapInArrow(gen, MEDIA_SCHEMA)


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
