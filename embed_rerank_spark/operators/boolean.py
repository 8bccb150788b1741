"""Boolean / structured query retrieval over the positional index —
the Lucene-style query surface that composes the engine's retrieval
primitives in one pass:

    +term      MUST contain the term
    -term      MUST NOT contain the term
    "a b c"    MUST contain the exact phrase (consecutive tokens)
    term*      prefix clause — expands to matching vocabulary terms
               (df-desc, capped), scored as SHOULD terms
    term       SHOULD — optional, contributes to the score if present

Pinned semantics (mirrored by the DuckDB oracle in
``__spark_entry__.py``):

- a doc QUALIFIES iff it contains every must term, contains every
  quoted phrase consecutively, contains none of the must-not terms,
  and — when the query has no must/phrase clause — contains at least
  one should/prefix term;
- the SCORE is the Okapi BM25 sum over the query's distinct POSITIVE
  terms (musts + shoulds + phrase tokens + prefix expansions) that the
  doc contains; must-nots never contribute;
- ranking uses the engine tie semantics (rounded score desc, doc_id
  asc). A must/phrase term absent from the corpus vocabulary empties
  that query (AND semantics).

Scale shape: identical to the other index readers — term-filtered
postings scan (the scan covers positive AND must-not terms), one
``mapInArrow`` per doc-shard (docs are whole within a shard, so every
clause resolves shard-locally), shard-local top-k, global window.
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from .bm25 import topk
from .positions import _phrase_match_score, load_termdata
from .postings import InvertedIndex, shard_partitioned
from .wand import expand_prefix

_CLAUSE_RE = re.compile(r'([+-]?)"([^"]*)"|([+-]?)(\S+)')


@dataclass
class BooleanQuery:
    musts: list[str] = field(default_factory=list)
    shoulds: list[str] = field(default_factory=list)
    nots: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)
    prefixes: list[str] = field(default_factory=list)

    def positive_terms(self) -> list[str]:
        """Distinct scoring terms, first-seen order (prefix expansions
        are appended by the planner after dictionary lookup)."""
        out: dict[str, None] = {}
        for t in self.musts:
            out[t] = None
        for ph in self.phrases:
            for t in ph:
                out[t] = None
        for t in self.shoulds:
            out[t] = None
        return list(out)


def parse_query(q: str) -> BooleanQuery:
    """Parse the mini query language (lowercased). ``-"..."``
    (negated phrase) is rejected — the oracle semantics are pinned for
    positive phrases only."""
    bq = BooleanQuery()
    for m in _CLAUSE_RE.finditer(q.strip().lower()):
        if m.group(2) is not None:
            if m.group(1) == "-":
                raise ValueError("negated phrases are not supported")
            toks = [t for t in m.group(2).split() if t]
            if toks:
                bq.phrases.append(toks)
        else:
            sign, tok = m.group(3), m.group(4)
            if not tok:
                continue
            if tok.endswith("*") and len(tok) > 1:
                # signed prefixes are rejected loudly: silently turning
                # '+data*' into an optional clause (or '-chem*' into a
                # literal never-matching term) would drop the user's
                # operator without a trace
                if sign:
                    raise ValueError(
                        f"signed prefix clause '{sign}{tok}' is not supported; "
                        "prefixes are SHOULD clauses"
                    )
                bq.prefixes.append(tok[:-1])
            elif sign == "+":
                bq.musts.append(tok)
            elif sign == "-":
                bq.nots.append(tok)
            else:
                bq.shoulds.append(tok)
    return bq


def _boolean_partition(
    batches: Iterator[pa.RecordBatch],
    queries: list[tuple[int, BooleanQuery, list[str]]],
    k: int,
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
):
    """queries: (qid, parsed query, positive scoring terms); ``excl``
    (deletion tombstones) masks docs from results; ``vers``
    (newest-wins doc versions) drops stale re-crawl postings at
    decode — NOT clauses included, so a term present only in a doc's
    old crawl no longer vetoes the doc."""
    shards = load_termdata(batches, vers)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None

    out_q, out_d, out_s = [], [], []
    for _sh, td in shards.items():
        for qid, bq, positives in queries:
            anchor_terms = list(bq.musts) + [t for ph in bq.phrases for t in ph]
            if any(t not in td for t in anchor_terms):
                continue  # docs are whole per shard: no match here
            cand: np.ndarray | None = None
            for t in sorted(set(anchor_terms), key=lambda t: len(td[t][0])):
                cand = (
                    td[t][0]
                    if cand is None
                    else np.intersect1d(cand, td[t][0], assume_unique=True)
                )
                if cand.size == 0:
                    break
            if cand is not None and cand.size == 0:
                continue
            for ph in bq.phrases:
                pdocs, _s, _p = _phrase_match_score(td, ph, idf, avgdl, k1, b)
                cand = (
                    pdocs
                    if cand is None
                    else np.intersect1d(cand, pdocs, assume_unique=True)
                )
                if cand.size == 0:
                    break
            if cand is not None and cand.size == 0:
                continue
            if cand is None:  # pure-should query: union of present terms
                arrs = [td[t][0] for t in positives if t in td]
                if not arrs:
                    continue
                cand = np.unique(np.concatenate(arrs))
            for t in bq.nots:
                if t in td and cand.size:
                    cand = cand[~np.isin(cand, td[t][0], assume_unique=True)]
            if excl_arr is not None and cand.size:
                cand = cand[~np.isin(cand, excl_arr)]
            if cand.size == 0:
                continue

            scores = np.zeros(len(cand))
            for t in positives:
                got = td.get(t)
                if got is None or t not in idf:
                    continue
                docs_t, tf_t, dl_t = got[0], got[1], got[2]
                rows = np.searchsorted(docs_t, cand)
                rows_c = np.minimum(rows, len(docs_t) - 1)
                present = docs_t[rows_c] == cand
                tfv = tf_t[rows_c[present]].astype(np.float64)
                dlv = dl_t[rows_c[present]].astype(np.float64)
                scores[present] += idf[t] * (tfv * (k1 + 1.0)) / (
                    tfv + k1 * (1.0 - b + b * dlv / avgdl)
                )
            r = np.round(scores, 6)
            order = np.lexsort((cand, -r))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend(int(cand[i]) for i in order)
            out_s.extend(float(scores[i]) for i in order)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s},
            schema=pa.schema(
                [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
            ),
        )


def boolean_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansion: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): boolean/structured retrieval
    over a POSITIONAL index (phrases need positions). See module
    docstring for the clause grammar and pinned semantics."""
    spark = index.postings.sparkSession
    plan: list[tuple[int, BooleanQuery, list[str]]] = []
    all_terms: set[str] = set()
    for qid, q in queries:
        bq = parse_query(q)
        for pfx in bq.prefixes:
            bq.shoulds.extend(expand_prefix(index, pfx, max_expansion))
        positives = bq.positive_terms()
        if not positives:
            continue
        plan.append((qid, bq, positives))
        all_terms.update(positives)
        all_terms.update(bq.nots)

    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items() if d > 0
    }
    # AND semantics: a zero-df must or phrase token empties the query
    plan = [
        (qid, bq, positives)
        for qid, bq, positives in plan
        if all(t in idf for t in bq.musts)
        and all(t in idf for ph in bq.phrases for t in ph)
    ]
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    avgdl = index.avgdl
    live = {t for _qid, bq, positives in plan for t in positives} | {
        t for _qid, bq, _p in plan for t in bq.nots
    }
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    filtered = index.postings.filter(F.col("term").isin(list(live)))
    n_parts = spark.sparkContext.defaultParallelism
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _boolean_partition(
            it, plan, k, idf, avgdl, k1, b, excl, vers
        ),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")
