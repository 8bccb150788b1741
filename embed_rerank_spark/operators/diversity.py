"""MMR — maximal marginal relevance diversification (Carbonell &
Goldstein 1998): greedily re-rank a candidate pool so each pick
maximizes ``lam * relevance - (1 - lam) * max_similarity_to_already_
picked``. The standard embedding-space diversifier every RAG stack
runs between retrieval and context assembly (the reference serves the
retrieval+rerank half of that stack; reference:
app/services/reranking_service.py returns the pool MMR consumes).

Greedy selection is inherently sequential PER QUERY, so this is the
legitimate Pandas-kernel case — but the kernel gets ONLY
planning-sized, pre-rounded scalars:

- relevance = cosine top-``pool`` per query (JVM fold arithmetic,
  broadcast queries — ``similarity.cosine_topk_bruteforce``),
- pairwise candidate-candidate cosines (JVM fold over a pool x pool
  self-join WITHIN each query's candidate set — pool^2 scalar rows
  per query, never corpus-sized),

both rounded to 6 decimals BEFORE the kernel, so the greedy argmax is
bit-stable across engines and the whole operator is oracle-checkable
(the oracle unrolls the k selection steps as chained CTEs). The
cogrouped-pandas kernel (relevance table x pairs table, grouped by
query_id) does no vector math at all — it only walks the greedy
recurrence numpy-side.

Scale shape: vectors shuffle once (the candidate join), pool^2
scalars per query is the only quadratic term and pool is a request
knob (~20-50), queries parallelize freely across groups."""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embed_rerank_spark.operators.similarity import (
    _as_double,
    _dot,
    cosine_topk_bruteforce,
)

MMR_SCHEMA = "query_id long, rank int, vec_id long, mmr double, rel double"


def _mmr_kernel(k: int, lam: float):
    def fn(rel_pdf: pd.DataFrame, pairs_pdf: pd.DataFrame) -> pd.DataFrame:
        if rel_pdf.empty:
            return pd.DataFrame(
                columns=["query_id", "rank", "vec_id", "mmr", "rel"]
            )
        qid = int(rel_pdf["query_id"].iloc[0])
        rel = dict(zip(rel_pdf["vec_id"].astype(int), rel_pdf["rel"]))
        sim: dict[tuple[int, int], float] = {}
        for a, b, s in zip(
            pairs_pdf["va"].astype(int), pairs_pdf["vb"].astype(int), pairs_pdf["s"]
        ):
            sim[(a, b)] = s
            sim[(b, a)] = s
        remaining = sorted(rel)
        picked: list[int] = []
        out = []
        for step in range(min(k, len(remaining))):
            best_id, best_obj = None, None
            for c in remaining:
                if not picked:
                    obj = rel[c]
                else:
                    obj = round(
                        lam * rel[c]
                        - (1.0 - lam) * max(sim[(c, p)] for p in picked),
                        6,
                    )
                if best_obj is None or obj > best_obj:
                    best_id, best_obj = c, obj
            picked.append(best_id)
            remaining.remove(best_id)
            out.append((qid, step + 1, best_id, best_obj, rel[best_id]))
        return pd.DataFrame(
            out, columns=["query_id", "rank", "vec_id", "mmr", "rel"]
        )

    return fn


def mmr_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """(query_id, rank, vec_id, mmr, rel): MMR-diversified top-k from
    a cosine top-``pool`` candidate set. ``mmr`` is the greedy
    objective at pick time (= ``rel`` for the first pick); ties break
    by vec_id asc on the 6-decimal-rounded objective."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    cands = cosine_topk_bruteforce(
        vectors, queries, k=pool, id_col=id_col, vec_col=vec_col,
        qid_col=qid_col, qvec_col=qvec_col,
    ).select("query_id", "vec_id", F.round("cosine", 6).alias("rel"))
    v = vectors.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    cv = cands.join(v, "vec_id").select("query_id", "vec_id", "v")
    a, b = cv.alias("a"), cv.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.round(
                _dot(F.col("a.v"), F.col("b.v"))
                / (
                    F.sqrt(_dot(F.col("a.v"), F.col("a.v")))
                    * F.sqrt(_dot(F.col("b.v"), F.col("b.v")))
                ),
                6,
            ).alias("s"),
        )
    )
    return (
        cands.groupby("query_id")
        .cogroup(pairs.groupby("query_id"))
        .applyInPandas(_mmr_kernel(k, lam), MMR_SCHEMA)
    )
