"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked lists.

The standard way to combine a sparse (BM25) and a dense (embedding)
retriever without score calibration — RRF (Cormack et al., SIGIR'09)
sums 1/(k0 + rank) per document across lists, so only RANKS matter
and the lists' incomparable score scales never meet. This is the
fusion behind Elasticsearch/OpenSearch hybrid search and the natural
composition point for this engine: WAND produces the sparse ranking,
cosine/LSH-ANN the dense one, Jaccard a lexical-overlap one — any
(query_id, rank, doc_id) DataFrames fuse.

No reference analogue (SURVEY.md §2.6): the reference runs embed-only
or rerank-only stages; fusion replaces its "pick one backend" switch
with rank-level combination.

Scale design: each input ranking is already tiny (n_queries x depth
rows — the retrievers did the heavy lifting), so fusion is a union +
one hash aggregation on (query_id, doc_id) + the global top-k window.
No corpus-sized data moves; the fusion cost is independent of corpus
size, which is what lets it sit in the query path at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import topk

RRF_K0 = 60


def rrf_fuse(
    rankings: list[DataFrame], k: int = 10, k0: int = RRF_K0
) -> DataFrame:
    """(query_id, rank, doc_id, score): fuse N ranked lists — each
    input holds (query_id, rank, doc_id) — by summed reciprocal rank
    1/(k0 + rank), re-ranked with the engine tie semantics (rounded
    score desc, doc_id asc). A doc absent from a list simply
    contributes nothing for it (the standard RRF convention)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        r.select(
            "query_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(float(k0)) + F.col("rank"))).alias("contrib"),
        )
        for r in rankings
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    fused = u.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("score"))
    return topk(fused, k)
