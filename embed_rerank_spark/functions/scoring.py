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

Second documented deviation (same rationale): the per-row Gaussian
draw is a counter-based splitmix64 + Box-Muller kernel
(``gaussian_rows``) instead of ``np.random.default_rng(seed)`` —
value (row, j) is a pure function of (seed, j), so it is vectorizable
across a whole Arrow batch and independent of any RNG library's
stream layout. The driver-side linear head keeps NumPy's generator
(it runs once, and its exact values are pinned by a unit test).
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_HIDDEN = 4096
DEFAULT_MAX_LENGTH = 512
PAD_ID = 0
UNK_ID = 1
SEP_ID = 2


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set):
    uint64 counter -> well-mixed uint64. Deliberate wrapping
    arithmetic."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def gaussian_rows(seeds: np.ndarray, hidden: int) -> np.ndarray:
    """(n, hidden) float32 standard normals where value (i, j) depends
    ONLY on (seeds[i], j): counter-based Box-Muller over a splitmix64
    stream, fully vectorized across the whole matrix.

    This replaces the per-row ``np.random.default_rng(seed)
    .standard_normal(hidden)`` construction (engine-semantics change,
    documented in the module docstring): a distributed engine should
    not pin its scores to one RNG library's internal stream layout,
    and the per-row generator construction was the rerank stage's
    inner-loop cost. Counters are ``seed * 2^32 + j`` so rows never
    overlap (seeds < 2^32)."""
    seeds = np.asarray(seeds, dtype=np.uint64)
    n = len(seeds)
    half = (hidden + 1) // 2
    with np.errstate(over="ignore"):
        ctr = (seeds[:, None] << np.uint64(32)) + np.arange(
            2 * half, dtype=np.uint64
        )[None, :]
        h = _splitmix64(ctr)
    # top 24 bits -> float32 uniform in (0, 1] (the +1 keeps log finite);
    # the whole pipeline stays float32 — scores are float32 anyway and
    # the SIMD transcendentals are ~40% cheaper than float64
    u = ((h >> np.uint64(40)).astype(np.float32) + np.float32(1.0)) * np.float32(2.0**-24)
    r = np.sqrt(np.float32(-2.0) * np.log(u[:, :half]))
    theta = np.float32(2.0 * np.pi) * u[:, half:]
    out = np.empty((n, 2 * half), dtype=np.float32)
    out[:, 0::2] = r * np.cos(theta)
    out[:, 1::2] = r * np.sin(theta)
    return out[:, :hidden]


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

    Gaussian generation is the counter-based ``gaussian_rows`` kernel
    (one vectorized pass over the whole batch); only the sha256 row
    seeds remain per-row, and they are a few percent of the old
    per-row generator cost.
    """
    n = input_ids.shape[0]
    if pooling == "cls":
        first = input_ids[:, 0] if input_ids.shape[1] > 0 else np.zeros(n, dtype=np.int64)
        seeds = (first.astype(np.int64) % (2**32 - 1)).astype(np.uint64)
    else:
        seeds = np.fromiter(
            (stable_seed_from_ids(row) for row in input_ids), dtype=np.uint64, count=n
        )
    out = gaussian_rows(seeds, hidden)
    out /= np.linalg.norm(out, axis=1, keepdims=True) + 1e-8
    return out


def text_pseudo_embeddings(texts: list[str], hidden: int = DEFAULT_HIDDEN) -> np.ndarray:
    """Per-text deterministic embedding (reference placeholder path,
    ``mlx_backend.py:543-555``): seeded standard normal
    (counter-based ``gaussian_rows``), L2-normalized with NO epsilon
    guard (that path divides by the exact norm)."""
    seeds = np.fromiter(
        (stable_seed_from_text(t) for t in texts), dtype=np.uint64, count=len(texts)
    )
    out = gaussian_rows(seeds, hidden)
    out /= np.linalg.norm(out, axis=1, keepdims=True)
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
    """``pooled @ w + b``, accumulated in float64.

    The inputs stay float32 (they ARE the semantics — the pooled
    embedding values are f32 Box-Muller outputs), but the dot product
    runs in f64 so the reported score is bit-reproducible across
    engines: an external SQL oracle re-scoring the same widened-to-f64
    vectors agrees to ~1e-15, far inside the 6-decimal tie/compare
    rounding, whereas an f32 accumulation drifts by up to
    ~dim * eps_f32 and can flip a rounded digit."""
    return pooled.astype(np.float64) @ fit_head_dim(w, pooled.shape[1]).astype(np.float64) + b


def group_pooled(
    query: str,
    passages: list[str],
    hidden: int = DEFAULT_HIDDEN,
    pooling: str = "mean",
    max_length: int = DEFAULT_MAX_LENGTH,
) -> np.ndarray:
    """Pair-tokenize ONE query's candidate passages and pool — the
    (order-sensitive, batch-scoped-vocab) embedding stage of
    ``rerank_group``, exposed separately so callers can materialize
    the pooled vectors themselves (e.g. for an external SQL oracle
    that re-scores ``pooled @ w``)."""
    input_ids = tokenize_pairs([query] * len(passages), passages, max_length)
    return pooled_pseudo_embeddings(input_ids, hidden, pooling)


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
    pooled = group_pooled(query, passages, hidden, pooling, max_length)
    w, b = head if head is not None else linear_head(model_name, hidden)
    scores = head_scores(pooled, w, b)
    return normalize_scores(scores, score_norm)
