"""Table-scale embedding operator (the reference's /api/v1/embed path
as a batch stage).

Reference semantics re-expressed (joonsoome/embed-rerank):

- deterministic per-text embedding: sha256(text)-seeded
  ``standard_normal(hidden)`` (reference placeholder path,
  ``app/backends/mlx_backend.py:537-555``; sha256 replaces the
  PYTHONHASHSEED-salted ``hash(text)`` — see ``functions/scoring.py``)
- dimension adjustment BEFORE normalization (service layer,
  ``app/services/embedding_service.py:254-311``): strategy
  ``as_is`` (keep hidden), ``hidden_size`` (alias of as_is for the
  deterministic backend), ``pad_or_truncate`` (zero-pad / slice to
  ``target_dim``)
- normalization guards differ BY LAYER and both are pinned semantics
  (SURVEY.md §2.3 E5): the backend path divides by ``norm + 1e-8``
  (``mlx_backend.py:523``), the service path zero-guards with
  ``norms[norms == 0] = 1`` (``embedding_service.py:313-317``).
  ``guard`` picks one; the default is the service layer (it is the
  outermost, what API clients observe)
- the OpenAI per-request ``dimensions`` variant truncates/pads AFTER
  normalization (``app/routers/openai_router.py:361-375``) —
  ``openai_dimensions`` applies that as a separate output transform

Execution: one ``mapInPandas`` stage over (id, text) — Arrow-batched,
no per-row Python at the Spark layer; the embedding math is NumPy.
At scale this is embarrassingly parallel (no shuffle at all).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scoring

STRATEGIES = ("as_is", "hidden_size", "pad_or_truncate")


def _adjust_dim(vecs: np.ndarray, target_dim: int | None, strategy: str) -> np.ndarray:
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown dimension strategy: {strategy}")
    if strategy in ("as_is", "hidden_size") or target_dim is None:
        return vecs
    d = vecs.shape[1]
    if target_dim < d:
        return vecs[:, :target_dim]
    if target_dim > d:
        pad = np.zeros((vecs.shape[0], target_dim - d), dtype=vecs.dtype)
        return np.concatenate([vecs, pad], axis=1)
    return vecs


def _normalize(vecs: np.ndarray, guard: str) -> np.ndarray:
    if guard == "backend":  # mlx_backend.py:523
        norms = np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-8
        return vecs / norms
    if guard == "service":  # embedding_service.py:313-317
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1
        return vecs / norms
    raise ValueError(f"unknown normalization guard: {guard}")


def embed_texts(
    docs: DataFrame,
    hidden: int = 256,
    normalize: bool = True,
    target_dim: int | None = None,
    dimension_strategy: str = "as_is",
    guard: str = "service",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, embedding: array<float>) — deterministic text embedding
    with the reference's dimension/normalization semantics."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            vecs = scoring.text_pseudo_embeddings(texts, hidden)
            vecs = _adjust_dim(vecs, target_dim, dimension_strategy)
            if normalize:
                vecs = _normalize(vecs, guard)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "embedding": list(vecs.astype(np.float32))}
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, "doc_id long, embedding array<float>"
    )


def openai_dimensions(embedded: DataFrame, dimensions: int) -> DataFrame:
    """Per-request OpenAI ``dimensions``: truncate or zero-pad AFTER
    normalization (``openai_router.py:361-375``) — pure JVM column ops."""
    vec = F.col("embedding")
    adjusted = F.when(
        F.size(vec) >= dimensions, F.slice(vec, 1, dimensions)
    ).otherwise(
        F.concat(
            vec,
            F.array_repeat(F.lit(0.0).cast("float"), dimensions - F.size(vec)),
        )
    )
    return embedded.withColumn("embedding", adjusted)


def base64_embedding_df(embedded: DataFrame, col: str = "embedding") -> DataFrame:
    """(.., embedding_b64): base64 of the float32-LE bytes via one
    vectorized pandas stage (NumPy ``tobytes`` + base64)."""
    import base64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            b64 = [
                base64.b64encode(
                    np.asarray(v, dtype=np.float32).tobytes()
                ).decode("ascii")
                for v in pdf[col]
            ]
            out = pdf.drop(columns=[col])
            out["embedding_b64"] = b64
            yield out

    out_fields = [f for f in embedded.schema.fields if f.name != col]
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
        + ", embedding_b64 string"
    )
    return embedded.mapInPandas(run, schema)
