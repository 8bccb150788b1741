"""Language-model (Dirichlet-smoothed) ranking over the same index.

A second similarity besides Okapi BM25 — the query-likelihood model
with Dirichlet smoothing (Zhai & Lafferty 2001, Lucene's
``LMDirichletSimilarity``): per matched query term

    contribution = ln(1 + tf / (mu * cf_t / C)) + ln(mu / (dl + mu))

with ``cf_t`` the term's COLLECTION frequency, ``C`` the total token
count, and ``mu`` the smoothing mass (2000 default). Scores stay
additive per matched term, so the engine's whole ranking stack
(doc-sharded scoring, rounded-score/doc-id tie order, global top-k
window) is reused; only the per-posting arithmetic changes.

Execution is term-at-a-time (vectorized decode + bincount per shard):
LMD contributions are usually NEGATIVE (log of a probability ratio),
so the block-max upper-bound pruning that pays for WAND under BM25
buys little — Lucene likewise scores LMD exhaustively over the
candidate lists. Collection statistics come FROM THE INDEX: cf is a
decode-aggregate over the query terms' postings only (memoized on the
handle like the df cache), C is one doc_stats aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codec import decode_block
from .bm25 import topk
from .postings import (
    InvertedIndex,
    shard_partitioned,
    version_arrays,
    version_keep,
)

DEFAULT_MU = 2000.0


def _cf_partition(batches: Iterator[pa.RecordBatch], vers: tuple = None):
    """Partial collection frequencies: decode each block's tf stream,
    sum per term. ``vers`` (newest-wins doc versions over a multi-unit
    tiered index) excludes stale re-crawl postings — the kernel
    decodes every block anyway, so the exact cf is free here."""
    vmask = version_arrays(vers)
    sums: dict[str, int] = {}
    for batch in batches:
        col = dict(zip(batch.schema.names, batch.columns))
        terms = col["term"].to_pylist()
        nds = col["n_docs"].to_pylist()
        docs_b = col["docs_bin"].to_pylist()
        tfs_b = col["tfs_bin"].to_pylist()
        dls_b = col["dls_bin"].to_pylist()
        segs = col["seg"].to_pylist() if "seg" in col else [0] * len(terms)
        for t, nd, db, tb, lb, seg in zip(terms, nds, docs_b, tfs_b, dls_b, segs):
            d, f, _l = decode_block(db, tb, lb, nd)
            if vmask is not None:
                keep = version_keep(d, seg, *vmask)
                if not keep.all():
                    f = f[keep]
            sums[t] = sums.get(t, 0) + int(f.sum())
    if sums:
        yield pa.RecordBatch.from_pydict(
            {"term": list(sums), "cf": list(sums.values())},
            schema=pa.schema([("term", pa.string()), ("cf", pa.int64())]),
        )


def cf_for_terms(index: InvertedIndex, terms: set[str]) -> dict[str, int]:
    """term -> collection frequency from the index postings (absent
    terms -> 0), memoized on the handle — the dictionary-cache shape
    ``df_for_terms`` uses, with a decode-aggregate instead of a
    term_stats scan."""
    cache = getattr(index, "_cf_cache", None)
    if cache is None:
        cache = index._cf_cache = {}
    missing = [t for t in terms if t not in cache]
    if missing:
        needed = ["term", "n_docs", "docs_bin", "tfs_bin", "dls_bin"]
        if "seg" in index.postings.columns:
            needed.append("seg")
        vers = index.doc_versions
        part = index.postings.select(*needed).filter(
            F.col("term").isin(missing)
        ).mapInArrow(
            lambda it: _cf_partition(it, vers), "term string, cf long"
        )
        for r in part.groupBy("term").agg(F.sum("cf").alias("cf")).collect():
            cache[r["term"]] = int(r["cf"])
        for t in missing:
            cache.setdefault(t, 0)
    return {t: cache[t] for t in terms}


def total_tokens(index: InvertedIndex) -> int:
    """C = sum of doc lengths (one doc_stats aggregation, cached)."""
    c = getattr(index, "_total_tokens", None)
    if c is None:
        c = index._total_tokens = int(
            index.doc_stats.agg(F.sum("dl")).collect()[0][0]
        )
    return c


def _lmd_partition(
    batches: Iterator[pa.RecordBatch],
    queries: list[tuple[int, list[tuple[str, float]]]],
    k: int,
    mu: float,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
):
    """Per shard: decode the query terms' postings once, accumulate
    per-doc LMD scores (bincount), emit shard-local top-k. ``vers``
    (newest-wins doc versions) drops stale re-crawl postings at
    decode."""
    shards: dict[int, dict[str, list]] = {}
    for batch in batches:
        col = dict(zip(batch.schema.names, batch.columns))
        segs = (
            col["seg"].to_pylist()
            if "seg" in col
            else [0] * len(col["term"])
        )
        for sh, t, seg, row in zip(
            col["shard"].to_pylist(),
            col["term"].to_pylist(),
            segs,
            zip(
                col["n_docs"].to_pylist(),
                col["docs_bin"].to_pylist(),
                col["tfs_bin"].to_pylist(),
                col["dls_bin"].to_pylist(),
            ),
        ):
            shards.setdefault(sh, {}).setdefault(t, []).append((seg, *row))

    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None
    vmask = version_arrays(vers)
    out_q, out_d, out_s = [], [], []
    for _sh, term_blocks in shards.items():
        decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for t, blks in term_blocks.items():
            ds, fs, ls = [], [], []
            for seg, nd, db, tb, lb in blks:
                d, f, l = decode_block(db, tb, lb, nd)
                if vmask is not None:
                    keep = version_keep(d, seg, *vmask)
                    if not keep.all():
                        d, f, l = d[keep], f[keep], l[keep]
                ds.append(d)
                fs.append(f)
                ls.append(l)
            decoded[t] = (
                np.concatenate(ds),
                np.concatenate(fs).astype(np.float64),
                np.concatenate(ls).astype(np.float64),
            )
        for qid, qterms in queries:
            arrs = [(decoded[t], mup) for t, mup in qterms if t in decoded]
            if not arrs:
                continue
            all_docs = np.concatenate([a[0][0] for a in arrs])
            # SAME association order as the oracle SQL:
            # ln(1 + tf / muP) + ln(mu / (dl + mu)), muP = mu*cf/C
            all_scores = np.concatenate(
                [
                    np.log(1.0 + f / mup) + np.log(mu / (l + mu))
                    for (_d, f, l), mup in arrs
                ]
            )
            if excl_arr is not None:
                live_m = ~np.isin(all_docs, excl_arr)
                all_docs, all_scores = all_docs[live_m], all_scores[live_m]
                if not len(all_docs):
                    continue
            uniq, inv = np.unique(all_docs, return_inverse=True)
            sums = np.bincount(inv, weights=all_scores)
            r = np.round(sums, 6)
            order = np.lexsort((uniq, -r))[:k]
            for i in order:
                out_q.append(qid)
                out_d.append(int(uniq[i]))
                out_s.append(float(sums[i]))
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s},
            schema=pa.schema(
                [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
            ),
        )


def lmd_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    mu: float = DEFAULT_MU,
) -> DataFrame:
    """(query_id, rank, doc_id, score): query-likelihood top-k with
    Dirichlet smoothing over the compressed index. Docs matching at
    least one in-collection query term are ranked (the candidate-set
    convention every disjunctive scorer here uses); ties follow the
    engine order (rounded score desc, doc_id asc)."""
    qterm_map: dict[int, list[str]] = {}
    all_terms: set[str] = set()
    for qid, q in queries:
        seen: list[str] = []
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.append(tok)
        qterm_map[qid] = seen
        all_terms.update(seen)
    spark = index.postings.sparkSession
    if not all_terms:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    cf = cf_for_terms(index, all_terms)
    c_tot = float(total_tokens(index))
    plan = []
    for qid, terms in qterm_map.items():
        qt = [(t, mu * cf[t] / c_tot) for t in terms if cf[t] > 0]
        if qt:
            plan.append((qid, qt))
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    live = sorted({t for _qid, qt in plan for t, _ in qt})
    needed = ["term", "shard", "n_docs", "docs_bin", "tfs_bin", "dls_bin"]
    if "seg" in index.postings.columns:
        needed.append("seg")
    filtered = index.postings.select(*needed).filter(F.col("term").isin(live))
    n_parts = spark.sparkContext.defaultParallelism
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _lmd_partition(it, plan, k, mu, excl, vers),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")
