"""Deterministic scoring semantics for the rerank stage.

Re-expresses the reference's embed-then-rerank ordering semantics
(joonsoome/embed-rerank) as pure NumPy kernels that run inside
Arrow-batched Spark stages:

- pair tokenization: ``query.split() + ["<SEP>"] + passage.split()``,
  first-seen vocab ids, pad to the batch max, truncate at
  ``max_length`` (reference ``mlx_reranker_backend.py:200-225``)
- pooled pseudo-embedding: seeded ``standard_normal(hidden)``,
  L2-normalized with a ``+1e-8`` guard (reference
  ``mlx_reranker_backend.py:259-271``)
- linear head: ``score = pooled @ w + b`` with ``w`` a
  sha256(model_name)-seeded unit vector, ``b = 0`` (reference
  ``mlx_reranker_backend.py:169-188,329-353``)
- score normalization: none / sigmoid / per-group minmax (reference
  ``mlx_reranker_backend.py:355-362``)
- ranked results: stable descending sort — ties keep input order,
  which our batch engine reproduces as "ties break by ascending
  candidate position/doc_id" (reference
  ``reranking_service.py:164-198``, Python Timsort stability)

DETERMINISM DEVIATION (documented engine semantics): the reference
seeds its mean-pooling fallback with Python ``hash(tuple(ids))``
(``mlx_backend.py:359``, ``mlx_reranker_backend.py:266``), which is
PYTHONHASHSEED-salted for strings BUT — for tuples of ints — is
actually stable; still, it is CPython-version-defined rather than
specified. A distributed engine cannot depend on interpreter hashing,
so this engine seeds with sha256 over the little-endian int64 id
sequence, the same construction the reference itself uses for its
linear head (``mlx_reranker_backend.py:183-184``). Pinned by unit
tests; ordering semantics (not bit-level seeds) are the parity target.
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_HIDDEN = 4096
DEFAULT_MAX_LENGTH = 512
PAD_ID = 0
UNK_ID = 1
SEP_ID = 2


def stable_seed_from_ids(ids: np.ndarray | list[int]) -> int:
    """sha256 over the int64-LE id sequence -> seed in [0, 2**32-1)."""
    arr = np.asarray(ids, dtype=np.int64)
    digest = hashlib.sha256(arr.tobytes()).digest()
    return int.from_bytes(digest[:8], "little") % (2**32 - 1)


def stable_seed_from_text(text: str) -> int:
    """sha256 text seed (replaces the reference's salted ``hash(text)``
    at ``mlx_backend.py:553``)."""
    digest = hashlib.sha256(text.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "little") % (2**31)


def tokenize_pairs(
    queries: list[str], passages: list[str], max_length: int = DEFAULT_MAX_LENGTH
) -> np.ndarray:
    """Pair tokenizer: first-seen vocab over the batch, ``<SEP>``
    between query and passage, pad with 0 to the batch max, truncate at
    ``max_length``. Vocab state is scoped to ONE batch = one
    (query, candidate-set) group, mirroring one reference request."""
    vocab: dict[str, int] = {"<PAD>": PAD_ID, "<UNK>": UNK_ID, "<SEP>": SEP_ID}
    rows: list[list[int]] = []
    for q, p in zip(queries, passages):
        toks: list[int] = []
        for tok in q.strip().split() + ["<SEP>"] + p.strip().split():
            if tok not in vocab:
                vocab[tok] = len(vocab)
            toks.append(vocab[tok])
        if not toks:
            toks = [PAD_ID]
        rows.append(toks[:max_length])
    max_len = max(len(r) for r in rows)
    out = np.zeros((len(rows), max_len), dtype=np.int64)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def pooled_pseudo_embeddings(
    input_ids: np.ndarray, hidden: int = DEFAULT_HIDDEN, pooling: str = "mean"
) -> np.ndarray:
    """Deterministic pooled embedding per padded id row.

    pooling="mean": seed from the whole padded row (so batch padding
    is part of the semantics, as in the reference).
    pooling="cls": seed from the first token id only
    (``mlx_reranker_backend.py:262-264``).
    """
    out = np.empty((input_ids.shape[0], hidden), dtype=np.float32)
    for i, row in enumerate(input_ids):
        if pooling == "cls":
            seed = (int(row[0]) if row.size > 0 else 0) % (2**32 - 1)
        else:
            seed = stable_seed_from_ids(row)
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(hidden).astype(np.float32)
        v /= np.linalg.norm(v) + 1e-8
        out[i] = v
    return out


def text_pseudo_embeddings(texts: list[str], hidden: int = DEFAULT_HIDDEN) -> np.ndarray:
    """Per-text deterministic embedding (reference placeholder path,
    ``mlx_backend.py:543-555``): seeded standard normal, L2-normalized
    with NO epsilon guard (that path divides by the exact norm)."""
    out = np.empty((len(texts), hidden), dtype=np.float32)
    for i, t in enumerate(texts):
        rng = np.random.default_rng(stable_seed_from_text(t))
        v = rng.standard_normal(hidden).astype(np.float32)
        out[i] = v / np.linalg.norm(v)
    return out


def linear_head(model_name: str, hidden: int = DEFAULT_HIDDEN) -> tuple[np.ndarray, float]:
    """sha256(model_name)-seeded unit-norm weight vector, bias 0
    (reference ``mlx_reranker_backend.py:182-188``). This construction
    is already cross-process deterministic — kept verbatim as
    semantics."""
    h = hashlib.sha256(model_name.encode("utf-8")).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    w = rng.standard_normal(hidden).astype(np.float32)
    w /= np.linalg.norm(w) + 1e-6
    return w, 0.0


def fit_head_dim(w: np.ndarray, pooled_dim: int) -> np.ndarray:
    """Pad with zeros / truncate the head to the pooled dim
    (reference ``mlx_reranker_backend.py:331-351``)."""
    w = np.asarray(w, dtype=np.float32).reshape(-1)
    if w.shape[0] < pooled_dim:
        return np.concatenate([w, np.zeros(pooled_dim - w.shape[0], dtype=np.float32)])
    return w[:pooled_dim]


def head_scores(pooled: np.ndarray, w: np.ndarray, b: float = 0.0) -> np.ndarray:
    return pooled @ fit_head_dim(w, pooled.shape[1]) + b


def normalize_scores(scores: np.ndarray, method: str = "none") -> np.ndarray:
    """none / sigmoid / minmax; minmax is stateful PER GROUP — the
    caller must pass one query's candidate scores at a time
    (reference ``mlx_reranker_backend.py:355-362``)."""
    if method == "sigmoid":
        return 1.0 / (1.0 + np.exp(-scores))
    if method == "minmax":
        s_min, s_max = float(np.min(scores)), float(np.max(scores))
        denom = (s_max - s_min) if (s_max - s_min) > 1e-8 else 1.0
        return (scores - s_min) / denom
    return scores


def cosine_scores(query_vec: np.ndarray, passage_vecs: np.ndarray) -> np.ndarray:
    """Embedding-similarity rerank scores (reference service fallback,
    ``reranking_service.py:148-160``): query normalized by exact norm,
    passages with a zero-guard (``norms[norms==0]=1``)."""
    q = query_vec / np.linalg.norm(query_vec)
    norms = np.linalg.norm(passage_vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1
    return (passage_vecs / norms) @ q


def jaccard_scores(query: str, passages: list[str]) -> list[float]:
    """Word-set Jaccard (reference last-resort rerank,
    ``mlx_backend.py:687-702``)."""
    q = set(query.lower().split())
    out = []
    for p in passages:
        pw = set(p.lower().split())
        out.append(float(len(q & pw) / max(len(q | pw), 1)))
    return out


def rerank_group(
    query: str,
    passages: list[str],
    model_name: str = "embed-rerank-spark",
    hidden: int = DEFAULT_HIDDEN,
    pooling: str = "mean",
    score_norm: str = "none",
    max_length: int = DEFAULT_MAX_LENGTH,
    head: tuple[np.ndarray, float] | None = None,
) -> np.ndarray:
    """Full deterministic cross-encoder-lite scoring for ONE query's
    candidate set (reference ``mlx_reranker_backend.py:300-364``).
    Returns raw scores aligned with ``passages`` order.

    ``head`` lets the caller pass a driver-computed (broadcast) weight
    vector so executors don't re-derive it per group (SURVEY.md §2.1
    S2: model weights -> broadcast variables)."""
    input_ids = tokenize_pairs([query] * len(passages), passages, max_length)
    pooled = pooled_pseudo_embeddings(input_ids, hidden, pooling)
    w, b = head if head is not None else linear_head(model_name, hidden)
    scores = head_scores(pooled, w, b)
    return normalize_scores(scores, score_norm)
