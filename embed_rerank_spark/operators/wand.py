"""Block-max WAND top-k retrieval over the compressed inverted index.

Distributed query model (document-partitioned search, the layout every
web-scale engine uses):

- query terms are known up front, so the postings scan is FILTERED by
  term (predicate pushdown into the parquet/Iceberg scan — only the
  query terms' posting blocks are ever read)
- each index doc-shard answers every query locally with block-max WAND
  (exact top-k within the shard), inside ONE ``mapInArrow`` stage over
  postings repartitioned by shard
- shard-local top-k rows are tiny (n_shards × n_queries × k), so the
  global merge is a cheap window top-k

Exactness contract: identical (doc_id, score) top-k as the brute-force
DataFrame scorer in ``operators/bm25.py`` (ties: score desc, doc_id
asc). WAND pruning uses upper bounds computed from block headers
(max_tf, min_dl) — mathematically >= any member score; a 1e-9 slack on
the threshold absorbs float rounding so pruning can never drop a true
top-k member.

No reference analogue (SURVEY.md §2.6): the reference's first stage is
an HTTP serving loop; this operator replaces it at table scale.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from ..functions.codec import decode_block
from .bm25 import topk
from .postings import (
    InvertedIndex,
    shard_partitioned,
    version_arrays,
    version_keep,
)

_INF = float("inf")
# Tie semantics: ranking keys round scores to 6 decimals (see
# bm25.topk). A doc can still tie/beat the kth rounded score when its
# raw score exceeds theta - 5e-7, so pruning keeps that margin (plus
# ulp headroom) — slightly less skipping, provably no false drops.
_TIE_DECIMALS = 6
_SLACK = 6e-7

_OUT_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
)


def _tfpart(tf, dl, avgdl: float, k1: float, b: float):
    """BM25 tf component — same association order as the oracle SQL:
    (tf * (k1+1)) / (tf + k1*(1 - b + b*dl/avgdl))."""
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


class _TermIterator:
    """Cursor over one (shard, term) posting list: lazy block decode,
    shallow (header-only) seeks for block-max skipping.

    ``seg``/``vmask``: newest-wins doc versioning over a multi-unit
    tiered index — ``vmask`` = (sorted doc_ids, newest seg per doc)
    for re-crawled docs, and ``_open`` drops this run's postings for
    docs whose newest unit is NOT ``seg`` right after decode, so every
    downstream walk (pivot, leapfrog, msm counting) sees only live
    postings. Block headers may then overstate (first/last/max_tf of
    the unmasked block) — still valid UPPER bounds, so block-max
    pruning stays exact."""

    __slots__ = (
        "blocks", "idf", "bi", "pos", "docs", "tfs", "dls", "cur", "term_ub", "term",
        "seg", "vmask",
    )

    def __init__(
        self,
        blocks: list,
        idf: float,
        avgdl: float,
        k1: float,
        b: float,
        term: str = "",
        seg: int = 0,
        vmask: tuple | None = None,
    ):
        self.term = term
        # blocks: list of tuples (first_doc, last_doc, n_docs, max_tf,
        # min_dl, docs_bin, tfs_bin, dls_bin) sorted by block_id
        self.blocks = blocks
        self.idf = idf
        self.seg = seg
        self.vmask = vmask
        self.bi = 0
        self.pos = 0
        self.docs = self.tfs = self.dls = None
        self.term_ub = idf * max(
            _tfpart(blk[3], blk[4], avgdl, k1, b) for blk in blocks
        )
        self._open(0)

    def _open(self, bi: int) -> None:
        while bi < len(self.blocks):
            blk = self.blocks[bi]
            docs, tfs, dls = decode_block(blk[5], blk[6], blk[7], blk[2])
            if self.vmask is not None:
                keep = version_keep(docs, self.seg, *self.vmask)
                if not keep.all():
                    docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            if len(docs):
                self.bi = bi
                self.docs, self.tfs, self.dls = docs, tfs, dls
                self.pos = 0
                self.cur = int(docs[0])
                return
            bi += 1  # every posting in the block was a stale crawl
        self.bi = bi
        self.cur = _INF
        self.docs = None

    def block_ub(self, avgdl: float, k1: float, b: float) -> float:
        """UB of the current block (valid after shallow_seek)."""
        if self.bi >= len(self.blocks):
            return 0.0
        blk = self.blocks[self.bi]
        return self.idf * _tfpart(blk[3], blk[4], avgdl, k1, b)

    def block_last(self) -> float:
        if self.bi >= len(self.blocks):
            return _INF
        return self.blocks[self.bi][1]

    def shallow_seek(self, target: int) -> None:
        """Move the BLOCK cursor (headers only) so current block's
        last_doc >= target. Does not decode."""
        bi = self.bi
        while bi < len(self.blocks) and self.blocks[bi][1] < target:
            bi += 1
        if bi != self.bi:
            if bi >= len(self.blocks):
                self.bi = bi
                self.cur = _INF
                self.docs = None
            else:
                self._open(bi)

    def next_geq(self, target: int) -> None:
        """Advance to the first doc >= target."""
        if self.cur == _INF or self.cur >= target:
            return
        self.shallow_seek(target)
        if self.cur == _INF:
            return
        if self.docs is None:
            self._open(self.bi)
        pos = int(np.searchsorted(self.docs, target, side="left"))
        if pos >= len(self.docs):
            self._open(self.bi + 1)
        else:
            self.pos = pos
            self.cur = int(self.docs[pos])

    def advance(self) -> None:
        """Move one posting forward."""
        self.pos += 1
        if self.pos >= len(self.docs):
            self._open(self.bi + 1)
        else:
            self.cur = int(self.docs[self.pos])

    def score(self, avgdl: float, k1: float, b: float) -> float:
        return self.idf * _tfpart(
            float(self.tfs[self.pos]), float(self.dls[self.pos]), avgdl, k1, b
        )


def _wand_one_query(
    term_blocks: dict[str, list],
    qterms: list[tuple[str, float]],
    k: int,
    avgdl: float,
    k1: float,
    b: float,
    excl: set | None = None,
    allowed: set | None = None,
    msm: int = 1,
    after: tuple[float, int] | None = None,
    vmask: tuple | None = None,
) -> list[tuple[int, float]]:
    """Exact top-k (doc_id, score) for one query over one shard.
    ``term_blocks[t]`` is a list of RUNS (one per index unit); each run
    gets its own cursor — the pivot/prefix logic already sums every
    cursor sitting on the pivot doc, so multiple same-term cursors
    with disjoint doc sets score exactly.

    ``excl`` (deletion tombstones) / ``allowed`` (filtered retrieval)
    mask docs from the result set: a masked doc never enters the heap,
    so theta only ever comes from eligible docs and pruning stays
    exact for the masked corpus.

    ``msm`` (minimum-should-match, Lucene semantics): a doc qualifies
    only if it matches >= msm DISTINCT query terms. Pruning gains a
    count constraint: the pivot prefix must span >= msm distinct terms
    before its UB sum can admit a candidate — any doc below that
    cursor sits in fewer than msm lists and is skipped without
    decoding (the mm-WAND extension of the pivot rule; msm=1 is
    plain WAND, msm=n_terms degenerates to the AND walk).

    ``after`` = (rounded_score, doc_id) keyset-pagination cursor (the
    last row of the previous page): only docs STRICTLY after it in
    ranking order (rounded score desc, doc_id asc) may enter the
    heap, so the heap holds exactly the next page's top-k and theta
    pruning stays exact for the post-cursor ranking.

    ``vmask`` (newest-wins doc versions): each run's cursor drops
    stale-crawl postings at decode, see ``_TermIterator``."""
    its = [
        _TermIterator(run, idf, avgdl, k1, b, term=t, seg=seg, vmask=vmask)
        for t, idf in qterms
        if t in term_blocks
        for seg, run in term_blocks[t]
    ]
    its = [it for it in its if it.cur != _INF]
    if not its:
        return []

    import heapq

    # entries (rounded_score, -doc_id, raw_score): the heap order IS the
    # engine's ranking order, so the kept set matches brute-force exactly
    heap: list[tuple[float, int, float]] = []

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else -_INF

    while True:
        its = [it for it in its if it.cur != _INF]
        if not its:
            break
        its.sort(key=lambda it: it.cur)
        th = theta()
        # pivot: first prefix whose term-UB sum can beat theta AND
        # (msm>1) that spans >= msm distinct terms — a doc below that
        # cursor sits in < msm lists, so it can't qualify
        acc = 0.0
        pivot_idx = -1
        if msm <= 1:
            for i, it in enumerate(its):
                acc += it.term_ub
                if acc > th - _SLACK:
                    pivot_idx = i
                    break
        else:
            prefix_terms: set[str] = set()
            for i, it in enumerate(its):
                acc += it.term_ub
                prefix_terms.add(it.term)
                if len(prefix_terms) >= msm and acc > th - _SLACK:
                    pivot_idx = i
                    break
        if pivot_idx < 0:
            break
        pivot_doc = its[pivot_idx].cur

        if its[0].cur == pivot_doc:
            # extend the prefix over every iterator sitting on the
            # pivot (their UBs must join the block-max check, and the
            # skip target below must clear them all)
            end = pivot_idx
            while end + 1 < len(its) and its[end + 1].cur == pivot_doc:
                end += 1
            prefix = its[: end + 1]
            matched = len({it.term for it in prefix}) if msm > 1 else 1
            bub = sum(it.block_ub(avgdl, k1, b) for it in prefix)
            if (
                matched < msm
                or (excl is not None and pivot_doc in excl)
                or (allowed is not None and pivot_doc not in allowed)
            ):
                for it in prefix:
                    it.advance()
            elif bub > th - _SLACK:
                score = 0.0
                for it in prefix:
                    score += it.score(avgdl, k1, b)
                    it.advance()
                entry = (round(score, _TIE_DECIMALS), -pivot_doc, score)
                if after is not None and entry[:2] >= (after[0], -after[1]):
                    continue  # at or before the cursor: previous pages
                if len(heap) < k:
                    heapq.heappush(heap, entry)
                elif entry[:2] > heap[0][:2]:
                    heapq.heapreplace(heap, entry)
            else:
                # block-max skip: docs up to the shallowest block end
                # among the prefix cannot beat theta — but only below
                # the next (non-prefix) cursor, which caps the jump
                nxt = min(it.block_last() for it in prefix) + 1
                if end + 1 < len(its):
                    nxt = min(nxt, its[end + 1].cur)
                target = int(max(nxt, pivot_doc + 1))
                for it in prefix:
                    it.next_geq(target)
        else:
            # move the strongest pre-pivot iterator up to the pivot
            far = max(
                (it for it in its[: pivot_idx + 1] if it.cur < pivot_doc),
                key=lambda it: it.term_ub,
            )
            far.next_geq(pivot_doc)

    return [(-nd, raw) for _rs, nd, raw in heap]


def _taat_topk(
    term_cache: dict[str, tuple[np.ndarray, np.ndarray]],
    qterms: list[tuple[str, float]],
    k: int,
    excl_arr: np.ndarray | None = None,
    allowed_arr: np.ndarray | None = None,
    msm: int = 1,
    after: tuple[float, int] | None = None,
) -> list[tuple[int, float]]:
    """Vectorized term-at-a-time exact top-k for SHORT posting lists.

    ``term_cache`` maps term -> (docs, tfpart) decoded ONCE per task
    and shared by every query touching the term. Produces identical
    (doc, score) results to the pivot WAND walk — same formula, same
    rounded-score/doc-id tie order — just without skipping, which only
    pays off when lists are long enough to skip. ``excl_arr`` (sorted
    tombstoned doc ids) masks deleted docs before accumulation;
    ``allowed_arr`` (sorted, filtered retrieval) restricts to a doc
    set; ``msm`` keeps only docs matching >= msm distinct query terms
    (one unique-docs bincount alongside the score bincount)."""
    arrs = [term_cache[t] for t, _ in qterms if t in term_cache]
    idfs = [idf for t, idf in qterms if t in term_cache]
    if not arrs:
        return []
    all_docs = np.concatenate([a[0] for a in arrs])
    all_scores = np.concatenate([idf * a[1] for a, idf in zip(arrs, idfs)])
    if excl_arr is not None and len(excl_arr):
        live = ~np.isin(all_docs, excl_arr)
        all_docs, all_scores = all_docs[live], all_scores[live]
        if not len(all_docs):
            return []
    if allowed_arr is not None:
        live = np.isin(all_docs, allowed_arr)
        all_docs, all_scores = all_docs[live], all_scores[live]
        if not len(all_docs):
            return []
    uniq, inv = np.unique(all_docs, return_inverse=True)
    sums = np.bincount(inv, weights=all_scores)
    if msm > 1:
        # distinct matched terms per doc: count each term's UNIQUE doc
        # set once (runs of one term may duplicate a doc across index
        # units — that's one match, not two)
        cnt = np.zeros(len(uniq), dtype=np.int64)
        for a in arrs:
            ud = np.unique(a[0])
            idx = np.searchsorted(uniq, ud)
            # masked (excl/allowed) docs are absent from uniq — drop
            # positions that don't land on the same doc id
            ok = idx < len(uniq)
            ok[ok] = uniq[idx[ok]] == ud[ok]
            cnt[idx[ok]] += 1
        keep = cnt >= msm
        # masked docs were already dropped from uniq, so cnt counts
        # only eligible docs; filter scores to qualifying docs
        uniq, sums = uniq[keep], sums[keep]
        if not len(uniq):
            return []
    r = np.round(sums, _TIE_DECIMALS)
    if after is not None:
        # keyset cursor: strictly after (rounded desc, doc asc)
        keep = (r < after[0]) | ((r == after[0]) & (uniq > after[1]))
        uniq, sums, r = uniq[keep], sums[keep], r[keep]
        if not len(uniq):
            return []
    order = np.lexsort((uniq, -r))[:k]
    return [(int(uniq[i]), float(sums[i])) for i in order]


def _parse_shards(
    batches: Iterator[pa.RecordBatch],
) -> dict[int, dict[str, dict[int, list]]]:
    """Materialize a task's posting blocks as
    shard -> term -> seg -> [block rows]. Bulk column conversion
    (C-speed), then one plain-list loop — no per-element Arrow
    accessor calls."""
    shards: dict[int, dict[str, dict[int, list]]] = {}
    for batch in batches:
        col = dict(zip(batch.schema.names, batch.columns))
        term_l = col["term"].to_pylist()
        shard_l = col["shard"].to_pylist()
        bid_l = col["block_id"].to_pylist()
        first_l = col["first_doc"].to_pylist()
        last_l = col["last_doc"].to_pylist()
        nd_l = col["n_docs"].to_pylist()
        mt_l = col["max_tf"].to_pylist()
        ml_l = col["min_dl"].to_pylist()
        docs_l = col["docs_bin"].to_pylist()
        tfs_l = col["tfs_bin"].to_pylist()
        dls_l = col["dls_bin"].to_pylist()
        seg_l = col["seg"].to_pylist() if "seg" in col else [0] * len(term_l)
        for sh, tm, seg, row in zip(
            shard_l,
            term_l,
            seg_l,
            zip(bid_l, first_l, last_l, nd_l, mt_l, ml_l, docs_l, tfs_l, dls_l),
        ):
            shards.setdefault(sh, {}).setdefault(tm, {}).setdefault(seg, []).append(row)
    return shards


def _wand_partition(
    batches: Iterator[pa.RecordBatch],
    queries: list[tuple[int, list[tuple[str, float]]]],
    k: int,
    avgdl: float,
    k1: float,
    b: float,
    taat_threshold: int = 100_000,
    excl: tuple[int, ...] = (),
    allowed: tuple[int, ...] | None = None,
    msm: int = 1,
    after: dict[int, tuple[float, int]] | None = None,
    vers: tuple = None,
):
    """One task: materialize its shards' (query-term-only) posting
    blocks, answer every query per shard.

    Postings may carry a ``seg`` column (multi-unit tiered index): a
    term's blocks then form one RUN per unit — runs have disjoint,
    ascending block ranges WITHIN a unit but interleave ACROSS units,
    so the pivot walk gets one independent cursor per (term, run)
    (WAND is agnostic to several cursors sharing a term), and the
    term-at-a-time path concatenates runs before the unique/bincount
    accumulation.

    ``excl``: tombstoned doc ids (deletes not yet folded in by
    compaction); ``allowed``: filtered-retrieval doc set (None = all)
    — masked from results in both paths. ``vers``: newest-wins doc
    versions (stale re-crawl postings dropped at decode in both
    paths)."""
    shards = _parse_shards(batches)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None
    excl_set = set(excl) if excl else None
    allowed_arr = (
        np.sort(np.asarray(allowed, dtype=np.int64)) if allowed is not None else None
    )
    allowed_set = set(allowed) if allowed is not None else None
    vmask = version_arrays(vers)

    out_q, out_d, out_s = [], [], []
    for _shard, term_blocks in shards.items():
        # order blocks by doc RANGE (first_doc, block_id) within each
        # run: salted hot terms restart block_id per range run, but
        # ranges are disjoint and ascending inside one unit, so
        # first_doc is the true order there; across units, runs stay
        # separate (seg, cursor) pairs
        tb = {
            t: [
                (seg, [blk[1:] for blk in sorted(run, key=lambda b: (b[1], b[0]))])
                for seg, run in sorted(runs.items())
            ]
            for t, runs in term_blocks.items()
        }
        term_len = {
            t: sum(blk[2] for _seg, run in runs for blk in run)
            for t, runs in tb.items()
        }
        # decode-once cache for the term-at-a-time path: (docs, tfpart)
        taat_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

        def cached(t: str) -> tuple[np.ndarray, np.ndarray]:
            got = taat_cache.get(t)
            if got is None:
                ds, tfs, dls = [], [], []
                for seg, run in tb[t]:
                    rd, rf, rl = [], [], []
                    for blk in run:
                        d, f, l = decode_block(blk[5], blk[6], blk[7], blk[2])
                        rd.append(d)
                        rf.append(f)
                        rl.append(l)
                    d = np.concatenate(rd)
                    f = np.concatenate(rf)
                    l = np.concatenate(rl)
                    if vmask is not None:
                        keep = version_keep(d, seg, *vmask)
                        if not keep.all():
                            d, f, l = d[keep], f[keep], l[keep]
                    ds.append(d)
                    tfs.append(f)
                    dls.append(l)
                d = np.concatenate(ds)
                tp = _tfpart(
                    np.concatenate(tfs).astype(np.float64),
                    np.concatenate(dls).astype(np.float64),
                    avgdl,
                    k1,
                    b,
                )
                got = taat_cache[t] = (d, tp)
            return got

        for qid, qterms in queries:
            n_postings = sum(term_len.get(t, 0) for t, _ in qterms)
            if n_postings == 0:
                continue
            cursor = after.get(qid) if after is not None else None
            if n_postings <= taat_threshold:
                # short lists: vectorized scoring beats pointer-walking
                cache = {t: cached(t) for t, _ in qterms if t in tb}
                results = _taat_topk(
                    cache, qterms, k, excl_arr, allowed_arr, msm, cursor
                )
            else:
                results = _wand_one_query(
                    tb, qterms, k, avgdl, k1, b, excl_set, allowed_set, msm, cursor,
                    vmask,
                )
            for doc_id, score in results:
                out_q.append(qid)
                out_d.append(doc_id)
                out_s.append(score)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s}, schema=_OUT_SCHEMA
        )


def wand_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
    allowed_docs=None,
    min_should_match: int = 1,
    after: dict[int, tuple[float, int]] | None = None,
    parse_boosts: bool = False,
) -> DataFrame:
    """(query_id, rank, doc_id, score): exact BM25 top-k via block-max
    WAND over the compressed index.

    ``parse_boosts=True`` enables Lucene query-time boost syntax:
    ``term^2.5`` multiplies that term's contribution (its idf) by the
    boost. Because the kernel derives every score AND every block /
    term upper bound from the per-(query, term) idf in the query plan,
    a boosted query stays exact — WAND prunes against the boosted
    bounds. A term repeated with different boosts keeps the max;
    malformed, negative, or NaN suffixes fall back to the literal
    token (a negative weight would invert the term upper bound and
    break pruning exactness; Lucene rejects negative boosts too).

    ``after`` maps query_id -> (rounded_score, doc_id) keyset cursor
    (the previous page's last row): results are the next ``k`` rows
    STRICTLY after the cursor in ranking order, re-ranked 1..k — deep
    pagination without an offset scan (Elasticsearch search_after
    semantics; offset paging would force every shard to return
    offset+k rows, a cursor keeps it at k).

    ``min_should_match`` (Lucene msm): docs must match >= that many
    DISTINCT query terms (out-of-vocabulary terms can never match, so
    a query with fewer in-vocab terms than msm returns zero rows);
    msm=1 is plain disjunctive WAND. Exactness contract vs
    ``bm25.bm25_topk_msm_bruteforce``.

    If the handle carries deletion tombstones (``index.tombstones``,
    LSM deletes not yet folded in by compaction), those docs are
    masked from results; corpus/term stats intentionally still count
    them until a compaction physically removes the postings — the
    standard deleted-docs visibility model (e.g. Lucene).

    ``allowed_docs`` (iterable of doc ids) = FILTERED retrieval:
    results restricted to the set, stats unchanged — the
    collection-search / doc-ACL case, where the allowed set is small
    relative to the corpus (it ships in the task closure; a broad
    categorical filter like language should instead be a partitioned
    index per category, or the declarative brute-force scorer with a
    WHERE clause — one scan, exact, no set to ship)."""
    # unique lowercased whitespace terms per query (engine semantics,
    # same as bm25.query_terms), each with its query-time boost
    qterm_map: dict[int, list[tuple[str, float]]] = {}
    all_terms: set[str] = set()
    for qid, q in queries:
        weights: dict[str, float] = {}
        order: list[str] = []
        for tok in q.strip().lower().split():
            if not tok:
                continue
            t, w = tok, 1.0
            if parse_boosts and "^" in tok:
                base, _, ws = tok.rpartition("^")
                try:
                    w = float(ws)
                    t = base
                except ValueError:
                    t, w = tok, 1.0
                # reject negative/NaN boosts like malformed suffixes
                # (fall back to the literal token): with a negative
                # idf, term_ub = idf * max(tfpart) is no longer an
                # UPPER bound — a negative-weight term's max
                # contribution is at MIN tf — so block-max pruning
                # could drop true top-k members. Lucene rejects
                # negative boosts outright for the same reason.
                if not t or not (w >= 0.0):
                    t, w = tok, 1.0
            if t in weights:
                weights[t] = max(weights[t], w)
            else:
                weights[t] = w
                order.append(t)
        qterm_map[qid] = [(t, weights[t]) for t in order]
        all_terms.update(order)

    # idf for query terms only: tiny driver-side lookup, memoized on
    # the index handle across batches (dictionary cache)
    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0)
        for t, d in dfs.items()
        if d > 0
    }
    query_plan = [
        (qid, [(t, idf[t] * w) for t, w in terms if t in idf])
        for qid, terms in qterm_map.items()
    ]
    query_plan = [(qid, qt) for qid, qt in query_plan if qt]
    if not query_plan:
        spark = index.postings.sparkSession
        empty = spark.createDataFrame([], "query_id long, rank int, doc_id long, score double")
        return empty

    avgdl = index.avgdl
    # prune to the columns WAND consumes: a POSITIONAL index carries a
    # pos_bin payload stream the BM25 path must not read (column
    # pruning reaches the parquet scan)
    needed = [
        "term", "shard", "block_id", "first_doc", "last_doc",
        "n_docs", "max_tf", "min_dl", "docs_bin", "tfs_bin", "dls_bin",
    ]
    if "seg" in index.postings.columns:
        needed.append("seg")
    filtered = index.postings.select(*needed).filter(
        F.col("term").isin(list(all_terms))
    )
    # one task owns whole shards -> shard-local exact top-k. Two
    # partitioning pitfalls matter here because the SCORING work per
    # shard is large while the postings bytes are small:
    # - an unsized repartition lets AQE coalesce tiny partitions and
    #   serialize the scoring onto one core -> explicit count
    # - HASH partitioning collides shard ids (32 values into 32
    #   partitions leaves ~1/e empty and piles 3-4 shards on one
    #   task) -> RANGE partitioning places each shard id in its own
    #   interval, so per-task load is max ceil(n_shards/n_parts)
    spark = index.postings.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    allowed = tuple(sorted(allowed_docs)) if allowed_docs is not None else None
    msm = min_should_match
    cursors = dict(after) if after else None
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _wand_partition(
            it, query_plan, k, avgdl, k1, b, taat_threshold, excl, allowed, msm,
            cursors, vers,
        ),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")


def search_after_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    page_size: int = 10,
    page: int = 2,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score): page ``page`` (1-based) of the
    ranking via keyset pagination — each page re-runs the query with
    the previous page's last (rounded_score, doc_id) as the ``after``
    cursor, so page N equals ranks ((N-1)*page_size, N*page_size] of
    the full ranking re-ranked 1..page_size.

    Page-boundary cursors are the only driver state (n_queries tuples
    per page); each pass ships only its own page back. The cursor
    rounds with the same half-even rounding as the ranking keys, so
    cursor equality is bit-exact across passes."""
    spark = index.postings.sparkSession
    cursors: dict[int, tuple[float, int]] | None = None
    for pg in range(1, page + 1):
        out = wand_topk(
            index, queries, page_size, k1, b, taat_threshold, after=cursors
        )
        if pg == page:
            return out
        rows = (
            out.filter(F.col("rank") == page_size)
            .select("query_id", "doc_id", "score")
            .collect()
        )
        cursors = {
            r["query_id"]: (round(r["score"], _TIE_DECIMALS), r["doc_id"])
            for r in rows
        }
        # a query whose page came up short has no further pages
        queries = [(qid, q) for qid, q in queries if qid in cursors]
        if not queries:
            break
    return spark.createDataFrame(
        [], "query_id long, rank int, doc_id long, score double"
    )


def _leapfrog_one_query(
    its: list[_TermIterator],
    k: int,
    avgdl: float,
    k1: float,
    b: float,
    excl: set | None = None,
) -> list[tuple[int, float]]:
    """Conjunctive (AND) top-k via leapfrog intersection: cursors
    repeatedly advance to the max current doc with ``next_geq`` — which
    skips whole BLOCKS via headers without decoding them — and a doc
    scores only when every cursor lands on it. The classic adaptive
    intersection; cost is driven by the rarest term's list, with
    block-level skipping on the dense ones."""
    import heapq

    heap: list[tuple[float, int, float]] = []
    while True:
        if any(it.cur == _INF for it in its):
            break
        target = max(it.cur for it in its)
        aligned = True
        for it in its:
            if it.cur < target:
                it.next_geq(target)
                aligned = False
        if not aligned:
            continue  # re-evaluate: someone may have overshot target
        if excl is None or target not in excl:
            score = 0.0
            for it in its:
                score += it.score(avgdl, k1, b)
            entry = (round(score, _TIE_DECIMALS), -target, score)
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry[:2] > heap[0][:2]:
                heapq.heapreplace(heap, entry)
        for it in its:
            it.advance()
    return [(-nd, raw) for _rs, nd, raw in heap]


def _conj_vectorized(
    term_cache: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    qterms: list[tuple[str, float]],
    k: int,
    avgdl: float,
    k1: float,
    b: float,
    excl_arr: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Vectorized conjunctive top-k for short lists / multi-run terms:
    successive sorted-array intersection (rarest first), then one
    searchsorted gather per term for the score sum. Identical results
    to the leapfrog walk. ``term_cache[t]`` = raw (docs, tf, dl)."""
    data = []
    for t, idf in qterms:
        got = term_cache.get(t)
        if got is None:
            return []
        d, tf, dl = got
        # duplicate docs across index units (a re-crawled url meeting
        # itself): sort by (doc, tf, dl) and keep the LAST row per doc
        # — the max-(tf, dl) winner, the same deterministic collapse
        # the merge encoder applies, so scores match the compacted
        # index and the phrase/boolean readers
        order = np.lexsort((dl, tf, d))
        d, tf, dl = d[order], tf[order], dl[order]
        last = np.empty(len(d), dtype=bool)
        last[-1:] = True
        last[:-1] = d[1:] != d[:-1]
        d, tf, dl = d[last], tf[last], dl[last]
        tp = _tfpart(
            tf.astype(np.float64), dl.astype(np.float64), avgdl, k1, b
        )
        data.append((d, idf * tp))
    data.sort(key=lambda x: len(x[0]))
    cand = data[0][0]
    for d, _s in data[1:]:
        cand = np.intersect1d(cand, d, assume_unique=True)
        if cand.size == 0:
            return []
    if excl_arr is not None and len(excl_arr):
        cand = cand[~np.isin(cand, excl_arr)]
        if cand.size == 0:
            return []
    scores = np.zeros(len(cand))
    for d, s in data:
        scores += s[np.searchsorted(d, cand)]
    r = np.round(scores, _TIE_DECIMALS)
    order = np.lexsort((cand, -r))[:k]
    return [(int(cand[i]), float(scores[i])) for i in order]


def _conj_partition(
    batches: Iterator[pa.RecordBatch],
    queries: list[tuple[int, list[tuple[str, float]]]],
    k: int,
    avgdl: float,
    k1: float,
    b: float,
    taat_threshold: int = 100_000,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
):
    """Conjunctive counterpart of ``_wand_partition``: every query
    term must be present in the shard (docs are whole within a shard,
    so a shard missing a term contributes no matches); long single-run
    lists use the block-skipping leapfrog, short or multi-run ones the
    vectorized set path. ``vers`` (newest-wins doc versions) drops
    stale re-crawl postings at decode in both paths."""
    shards = _parse_shards(batches)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None
    excl_set = set(excl) if excl else None
    vmask = version_arrays(vers)

    out_q, out_d, out_s = [], [], []
    for _shard, term_blocks in shards.items():
        tb = {
            t: [
                (seg, [blk[1:] for blk in sorted(run, key=lambda b: (b[1], b[0]))])
                for seg, run in sorted(runs.items())
            ]
            for t, runs in term_blocks.items()
        }
        term_len = {
            t: sum(blk[2] for _seg, run in runs for blk in run)
            for t, runs in tb.items()
        }
        # decode-once cache of RAW (docs, tf, dl) per term: the
        # vectorized path needs tf/dl to collapse duplicate docs to
        # the max-(tf, dl) winner before scoring
        conj_cache: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

        def cached(t: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
            got = conj_cache.get(t)
            if got is None:
                ds, tfs, dls = [], [], []
                for seg, run in tb[t]:
                    rd, rf, rl = [], [], []
                    for blk in run:
                        d, f, l = decode_block(blk[5], blk[6], blk[7], blk[2])
                        rd.append(d)
                        rf.append(f)
                        rl.append(l)
                    d = np.concatenate(rd)
                    f = np.concatenate(rf)
                    l = np.concatenate(rl)
                    if vmask is not None:
                        keep = version_keep(d, seg, *vmask)
                        if not keep.all():
                            d, f, l = d[keep], f[keep], l[keep]
                    ds.append(d)
                    tfs.append(f)
                    dls.append(l)
                got = conj_cache[t] = (
                    np.concatenate(ds),
                    np.concatenate(tfs),
                    np.concatenate(dls),
                )
            return got

        for qid, qterms in queries:
            if any(t not in tb for t, _ in qterms):
                continue
            n_postings = sum(term_len[t] for t, _ in qterms)
            single_run = all(len(tb[t]) == 1 for t, _ in qterms)
            if single_run and n_postings > taat_threshold:
                its = [
                    _TermIterator(
                        tb[t][0][1], idf, avgdl, k1, b,
                        seg=tb[t][0][0], vmask=vmask,
                    )
                    for t, idf in qterms
                ]
                results = _leapfrog_one_query(its, k, avgdl, k1, b, excl_set)
            else:
                cache = {t: cached(t) for t, _ in qterms}
                results = _conj_vectorized(
                    cache, qterms, k, avgdl, k1, b, excl_arr
                )
            for doc_id, score in results:
                out_q.append(qid)
                out_d.append(doc_id)
                out_s.append(score)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s}, schema=_OUT_SCHEMA
        )


def conjunctive_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score): conjunctive (AND) BM25 top-k
    over the compressed index — docs containing EVERY unique query
    term (a query with an out-of-vocabulary term returns zero rows),
    scored with the same Okapi sum and tie semantics as ``wand_topk``.
    Must match ``bm25.bm25_topk_conjunctive_bruteforce`` exactly."""
    qterm_map: dict[int, list[str]] = {}
    all_terms: set[str] = set()
    for qid, q in queries:
        seen: list[str] = []
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.append(tok)
        qterm_map[qid] = seen
        all_terms.update(seen)

    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0)
        for t, d in dfs.items()
        if d > 0
    }
    # AND semantics: drop queries with no terms or any zero-df term
    query_plan = [
        (qid, [(t, idf[t]) for t in terms])
        for qid, terms in qterm_map.items()
        if terms and all(t in idf for t in terms)
    ]
    spark = index.postings.sparkSession
    if not query_plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )

    avgdl = index.avgdl
    live_terms = {t for _qid, qt in query_plan for t, _ in qt}
    needed = [
        "term", "shard", "block_id", "first_doc", "last_doc",
        "n_docs", "max_tf", "min_dl", "docs_bin", "tfs_bin", "dls_bin",
    ]
    if "seg" in index.postings.columns:
        needed.append("seg")
    filtered = index.postings.select(*needed).filter(
        F.col("term").isin(list(live_terms))
    )
    n_parts = spark.sparkContext.defaultParallelism
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _conj_partition(
            it, query_plan, k, avgdl, k1, b, taat_threshold, excl, vers
        ),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")


def expand_prefix(
    index: InvertedIndex, prefix: str, max_expansion: int = 64
) -> list[str]:
    """Dictionary expansion for a wildcard query ``prefix*``: matching
    vocabulary terms, highest-df first (df desc, term asc), capped at
    ``max_expansion`` — the Lucene-style rewrite bound that keeps a
    hot prefix ("t*") from exploding into the whole dictionary. The
    term_stats scan is filtered by ``startswith`` (string-prefix
    pushdown-friendly) and returns only the capped list to the
    driver."""
    rows = (
        index.term_stats.filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansion)
        .collect()
    )
    return [r["term"] for r in rows]


def prefix_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansion: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score): wildcard retrieval — each
    query string is a TERM PREFIX; it expands to the matching
    vocabulary terms (df-desc capped) and scores as the disjunctive
    BM25 of the expansion, sharing the WAND machinery. Equivalent to
    an OR query over the expanded terms, so the brute-force oracle is
    the standard BM25 with the expansion as the query's term set."""
    expansions = {qid: expand_prefix(index, q.strip().lower(), max_expansion)
                  for qid, q in queries}
    synth: list[tuple[int, str]] = [
        (qid, " ".join(terms)) for qid, terms in expansions.items() if terms
    ]
    if not synth:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return wand_topk(index, synth, k, k1, b, taat_threshold)


def expand_suffix(
    index: InvertedIndex, suffix: str, max_expansion: int = 64
) -> list[str]:
    """Dictionary expansion for a LEADING-wildcard query ``*suffix``:
    vocabulary terms ENDING with the suffix, df desc / term asc,
    capped — via the REVERSED-TERM field (Lucene's
    ReverseStringFilter trick): ``write_index``/``merge_segments``
    store ``rterm = reverse(term)`` alongside the dictionary, so
    ``*suffix`` becomes ``rterm startswith reverse(suffix)`` — a
    pushdown-able string-prefix predicate on a STORED column (the
    parquet scan evaluates it with column stats; plan guard in
    ``test_plans.py``) instead of a full-vocabulary endswith. Indexes
    whose term_stats predate the column (or are derived on the fly,
    e.g. the tiered view) fall back to computing the reverse in the
    same scan — identical results, no stats pruning."""
    rts = index.term_stats
    if "rterm" not in rts.columns:
        rts = rts.withColumn("rterm", F.reverse(F.col("term")))
    rows = (
        rts.filter(F.col("rterm").startswith(suffix[::-1]))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansion)
        .collect()
    )
    return [r["term"] for r in rows]


def suffix_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansion: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score): leading-wildcard retrieval —
    each query string is a TERM SUFFIX; expands to matching vocabulary
    terms (df-desc capped) and scores as the disjunctive BM25 of the
    expansion (same contract as prefix_topk)."""
    expansions = {qid: expand_suffix(index, q.strip().lower(), max_expansion)
                  for qid, q in queries}
    synth: list[tuple[int, str]] = [
        (qid, " ".join(terms)) for qid, terms in expansions.items() if terms
    ]
    if not synth:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return wand_topk(index, synth, k, k1, b, taat_threshold)


def expand_wildcard(
    index: InvertedIndex, pattern: str, max_expansion: int = 64
) -> list[str]:
    """Dictionary expansion for a general Lucene ``WildcardQuery``
    pattern (``*`` = any run, ``?`` = one char, anything else
    literal; must match the WHOLE term): the anchored compiled regex
    evaluates inside the dictionary scan, and — Lucene's
    WildcardQuery optimization — the pattern's LITERAL PREFIX (up to
    the first wildcard char) is pushed down as a ``startswith``
    predicate first, so ``cust*er`` touches only the ``cust`` prefix
    range of the vocabulary (parquet column stats prune; same
    mechanism as ``expand_prefix``/the fc-dictionary range lookup).
    A leading-wildcard pattern has no literal prefix and degrades to
    the regexp scan, as in Lucene. df desc / term asc, capped."""
    import re as _re

    wild = [j for j, c in enumerate(pattern) if c in "*?"]
    prefix = pattern[: wild[0]] if wild else pattern
    rx = "".join(
        ".*" if c == "*" else "." if c == "?" else _re.escape(c) for c in pattern
    )
    rts = index.term_stats
    if prefix:
        rts = rts.filter(F.col("term").startswith(prefix))
    rows = (
        rts.filter(F.col("term").rlike(f"^(?:{rx})$"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansion)
        .collect()
    )
    return [r["term"] for r in rows]


def wildcard_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansion: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score): general wildcard retrieval —
    each query string is a Lucene wildcard pattern (``*``/``?``); it
    expands to the full-matching vocabulary terms (df-desc capped,
    literal-prefix pruned) and scores as the disjunctive BM25 of the
    expansion via the unchanged WAND machinery (same rewrite contract
    as prefix/suffix/regexp/fuzzy)."""
    expansions = {
        qid: expand_wildcard(index, q.strip().lower(), max_expansion)
        for qid, q in queries
    }
    synth: list[tuple[int, str]] = [
        (qid, " ".join(terms)) for qid, terms in expansions.items() if terms
    ]
    if not synth:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return wand_topk(index, synth, k, k1, b, taat_threshold)


def expand_regexp(
    index: InvertedIndex, pattern: str, max_expansion: int = 64
) -> list[str]:
    """Dictionary expansion for a regexp term query (Lucene
    ``RegexpQuery`` semantics: the pattern must match the WHOLE term,
    so ``jo.n`` matches ``join`` but not ``jointly``): vocabulary
    terms full-matching the pattern, df desc / term asc, capped at
    ``max_expansion``. One filtered pass over the term dictionary —
    the dictionary is vocabulary-sized (~millions of rows at web
    scale), not corpus-sized, and the JVM evaluates the anchored
    ``rlike`` inside the scan. Portable-regex note: callers should
    stick to the POSIX-ish intersection (literals, ``.``, classes,
    ``*``/``+``/``?``, alternation) so the engine (Java regex) and any
    external oracle (RE2/PCRE) agree."""
    anchored = f"^(?:{pattern})$"
    rows = (
        index.term_stats.filter(F.col("term").rlike(anchored))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansion)
        .collect()
    )
    return [r["term"] for r in rows]


def regexp_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansion: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score): regexp retrieval — each query
    string is a TERM REGEXP; it expands to the full-matching
    vocabulary terms (df-desc capped) and scores as the disjunctive
    BM25 of the expansion via the unchanged WAND machinery (same
    rewrite contract as prefix/suffix/fuzzy: the brute-force oracle is
    standard BM25 with the expansion as the query's term set)."""
    expansions = {
        qid: expand_regexp(index, q.strip().lower(), max_expansion)
        for qid, q in queries
    }
    synth: list[tuple[int, str]] = [
        (qid, " ".join(terms)) for qid, terms in expansions.items() if terms
    ]
    if not synth:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return wand_topk(index, synth, k, k1, b, taat_threshold)


def _explain_partition(
    batches: Iterator[pa.RecordBatch],
    term_queries: dict[str, list[tuple[int, float]]],
    wanted: dict[int, np.ndarray],
    avgdl: float,
    k1: float,
    b: float,
    vers: tuple = None,
):
    """Decode the (query-term-filtered) postings and emit one row per
    (query, top-k doc, matched term) with the score decomposition.
    ``vers`` (newest-wins doc versions, multi-unit tiered index) drops
    a re-crawled doc's stale-unit postings so the breakdown matches
    what the scorers actually summed — one row per (query, doc, term),
    never one per unit."""
    vmask = version_arrays(vers)
    out = {k: [] for k in ("query_id", "doc_id", "term", "tf", "dl", "idf", "contribution")}
    for batch in batches:
        col = dict(zip(batch.schema.names, batch.columns))
        terms = col["term"].to_pylist()
        nds = col["n_docs"].to_pylist()
        docs_b = col["docs_bin"].to_pylist()
        tfs_b = col["tfs_bin"].to_pylist()
        dls_b = col["dls_bin"].to_pylist()
        segs = col["seg"].to_pylist() if "seg" in col else [0] * len(terms)
        for t, nd, db, tb, lb, seg in zip(terms, nds, docs_b, tfs_b, dls_b, segs):
            qs = term_queries.get(t)
            if not qs:
                continue
            d, f, l = decode_block(db, tb, lb, nd)
            if vmask is not None:
                keep = version_keep(d, seg, *vmask)
                if not keep.all():
                    d, f, l = d[keep], f[keep], l[keep]
                    if not len(d):
                        continue
            for qid, idf in qs:
                w = wanted[qid]
                m = np.isin(d, w)
                if not m.any():
                    continue
                dm, fm, lm = d[m], f[m], l[m]
                contrib = idf * _tfpart(
                    fm.astype(np.float64), lm.astype(np.float64), avgdl, k1, b
                )
                n = len(dm)
                out["query_id"].extend([qid] * n)
                out["doc_id"].extend(int(x) for x in dm)
                out["term"].extend([t] * n)
                out["tf"].extend(int(x) for x in fm)
                out["dl"].extend(int(x) for x in lm)
                out["idf"].extend([idf] * n)
                out["contribution"].extend(float(c) for c in contrib)
    if out["query_id"]:
        yield pa.RecordBatch.from_pydict(
            out,
            schema=pa.schema(
                [
                    ("query_id", pa.int64()),
                    ("doc_id", pa.int64()),
                    ("term", pa.string()),
                    ("tf", pa.int64()),
                    ("dl", pa.int64()),
                    ("idf", pa.float64()),
                    ("contribution", pa.float64()),
                ]
            ),
        )


def explain_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, doc_id, term, tf, dl, idf, contribution): the
    Lucene-`explain`-style score breakdown for each query's top-k
    docs — one row per matched query term, where summing
    ``contribution`` over terms reproduces the doc's BM25 score
    exactly (same formula/association order as the scorers).

    Two passes over the same term-filtered postings scan: WAND picks
    the top-k doc set (tiny, ships in the closure), then one decode
    pass emits the per-term rows for exactly those docs — no
    re-scoring of the corpus, cost proportional to the query terms'
    postings as usual. Exact over a multi-unit (un-compacted tiered)
    index too: units hold disjoint docs except re-crawls, and the
    newest-wins version mask on the handle drops a re-crawled doc's
    stale-unit postings here exactly as the scorers do, so
    contributions still sum bit-exactly to the WAND score."""
    ranked = wand_topk(index, queries, k, k1, b).select("query_id", "doc_id").collect()
    wanted: dict[int, list[int]] = {}
    for r in ranked:
        wanted.setdefault(r["query_id"], []).append(r["doc_id"])
    wanted_np = {qid: np.sort(np.asarray(ds, dtype=np.int64)) for qid, ds in wanted.items()}

    qterm_map: dict[int, list[str]] = {}
    all_terms: set[str] = set()
    for qid, q in queries:
        if qid not in wanted_np:
            continue
        seen: list[str] = []
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.append(tok)
        qterm_map[qid] = seen
        all_terms.update(seen)
    spark = index.postings.sparkSession
    if not all_terms or not wanted_np:
        return spark.createDataFrame(
            [],
            "query_id long, doc_id long, term string, tf long, dl long, idf double, contribution double",
        )
    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0)
        for t, d in dfs.items()
        if d > 0
    }
    term_queries: dict[str, list[tuple[int, float]]] = {}
    for qid, terms in qterm_map.items():
        for t in terms:
            if t in idf:
                term_queries.setdefault(t, []).append((qid, idf[t]))

    needed = ["term", "n_docs", "docs_bin", "tfs_bin", "dls_bin"]
    if "seg" in index.postings.columns:
        needed.append("seg")
    filtered = index.postings.select(*needed).filter(
        F.col("term").isin(list(term_queries))
    )
    avgdl = index.avgdl
    vers = index.doc_versions
    return filtered.mapInArrow(
        lambda it: _explain_partition(
            it, term_queries, wanted_np, avgdl, k1, b, vers
        ),
        "query_id long, doc_id long, term string, tf long, dl long, idf double, contribution double",
    )


def build_trigram_dictionary(index: InvertedIndex) -> DataFrame:
    """(tri, term, df): inverted character-trigram index over the term
    DICTIONARY — the standard infix-wildcard accelerator (Lucene's
    ngram-filtered dictionary / pg_trgm): a ``*mid*`` query reads only
    the dictionary rows sharing mid's trigrams instead of running
    ``contains`` over the whole vocabulary.

    One pass over term_stats: JVM array expr emits each term's
    distinct trigrams (terms shorter than 3 chars emit nothing — those
    infixes take the fallback scan). Size ~ (avg term len) x vocab,
    hash-partitioned by ``tri`` — build once per index, reuse across
    query batches (callers should persist/cache it; at web scale it is
    written next to term_stats at build time)."""
    term = F.col("term")
    tris = F.when(
        F.length(term) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(term) - 2),
                lambda i: term.substr(i, F.lit(3)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return index.term_stats.select(
        F.explode(tris).alias("tri"), "term", "df"
    )


def expand_infix(
    index: InvertedIndex,
    infix: str,
    max_expansion: int = 64,
    tri_dict: DataFrame = None,
) -> list[str]:
    """Dictionary expansion for a double-wildcard query ``*mid*``:
    vocabulary terms CONTAINING the infix, df desc / term asc, capped
    at ``max_expansion``.

    With >= 3 chars of infix, candidates come from the trigram
    dictionary: terms carrying ALL of the infix's trigrams (a
    broadcast semi-join of the tiny trigram set into the tri-keyed
    scan + one count agg), then the cheap residual ``contains`` check
    on candidates only — never a full-vocabulary contains scan.
    Shorter infixes can't use trigrams and fall back to the filtered
    dictionary scan (bounded: the dictionary, not the postings)."""
    needle = infix.strip().lower()
    if not needle:
        return []
    if tri_dict is None or len(needle) < 3:
        rows = (
            index.term_stats.filter(F.col("term").contains(needle))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansion)
            .collect()
        )
        return [r["term"] for r in rows]
    q_tris = sorted({needle[i : i + 3] for i in range(len(needle) - 2)})
    cands = (
        tri_dict.filter(F.col("tri").isin(q_tris))
        .groupBy("term", "df")
        .agg(F.count_distinct("tri").alias("n_tri"))
        .filter(F.col("n_tri") == len(q_tris))
    )
    rows = (
        cands.filter(F.col("term").contains(needle))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansion)
        .collect()
    )
    return [r["term"] for r in rows]


def infix_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansion: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
    tri_dict: DataFrame = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score): double-wildcard retrieval —
    each query string is a TERM INFIX (``*mid*``); expands through the
    trigram dictionary (df-desc capped) and scores as the disjunctive
    BM25 of the expansion (same contract as prefix/suffix_topk). Pass
    a cached ``build_trigram_dictionary(index)`` to amortize the
    dictionary derivation across batches."""
    if tri_dict is None:
        tri_dict = build_trigram_dictionary(index)
    expansions = {
        qid: expand_infix(index, q, max_expansion, tri_dict) for qid, q in queries
    }
    synth: list[tuple[int, str]] = [
        (qid, " ".join(terms)) for qid, terms in expansions.items() if terms
    ]
    if not synth:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return wand_topk(index, synth, k, k1, b, taat_threshold)


def expand_term_range(
    index: InvertedIndex,
    lower: str | None,
    upper: str | None,
    include_lower: bool = True,
    include_upper: bool = False,
    max_expansion: int = 64,
) -> list[str]:
    """Dictionary expansion for a Lucene ``TermRangeQuery`` / ES
    ``range``-on-keyword clause: vocabulary terms lexicographically
    between ``lower`` and ``upper`` (either bound may be None = open,
    inclusivity per flag — ES gte/gt/lte/lt), df desc / term asc,
    capped at ``max_expansion`` (Lucene's multi-term rewrite bound).
    Both bound predicates are sargable string comparisons the
    dictionary scan pushes down (parquet min/max stats prune; the
    fc-dictionary's block ranges prune the same way)."""
    rts = index.term_stats
    if lower is not None:
        rts = rts.filter(
            F.col("term") >= lower if include_lower else F.col("term") > lower
        )
    if upper is not None:
        rts = rts.filter(
            F.col("term") <= upper if include_upper else F.col("term") < upper
        )
    rows = (
        rts.orderBy(F.desc("df"), F.asc("term")).limit(max_expansion).collect()
    )
    return [r["term"] for r in rows]


def term_range_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str | None, str | None]],
    k: int = 10,
    max_expansion: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score): term-range retrieval — each
    query is (id, lower, upper), [lower, upper) like Lucene's
    TermRangeQuery default, expanded against the dictionary and scored
    as the disjunctive BM25 of the expansion via the unchanged WAND
    machinery (Lucene's SCORING_BOOLEAN_REWRITE; the constant-score
    rewrite is ``filtered_topk`` with the same expansion as the
    filter)."""
    synth: list[tuple[int, str]] = []
    for qid, lo, hi in queries:
        terms = expand_term_range(index, lo, hi, max_expansion=max_expansion)
        if terms:
            synth.append((qid, " ".join(terms)))
    if not synth:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return wand_topk(index, synth, k, k1, b, taat_threshold)


def _filter_partition(
    batches: Iterator[pa.RecordBatch],
    queries: list[tuple[int, list[str]]],
    k: int,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
    any_match: bool = False,
):
    """Filter-context kernel: per shard, the <= k SMALLEST doc_ids
    containing EVERY query term (``any_match=False``, the bool-filter
    AND) or ANY query term (``any_match=True``, the ES ``terms``
    query) — no scoring, no tf/dl math (the blocks' docs stream is
    the only thing decoded; tf/dl bins ride along only because the
    block layout is fixed). Docs are whole within a shard, so
    per-shard intersection/union is exact; newest-wins versions and
    tombstones mask at decode like every other kernel."""
    shards = _parse_shards(batches)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None
    vmask = version_arrays(vers)

    out_q, out_d = [], []
    for _shard, term_blocks in shards.items():
        tb = {
            t: [
                (seg, [blk[1:] for blk in sorted(run, key=lambda b: (b[1], b[0]))])
                for seg, run in sorted(runs.items())
            ]
            for t, runs in term_blocks.items()
        }
        docs_cache: dict[str, np.ndarray] = {}

        def docs_of(t: str) -> np.ndarray:
            got = docs_cache.get(t)
            if got is None:
                ds = []
                for seg, run in tb[t]:
                    d = np.concatenate(
                        [decode_block(blk[5], blk[6], blk[7], blk[2])[0] for blk in run]
                    )
                    if vmask is not None:
                        d = d[version_keep(d, seg, *vmask)]
                    ds.append(d)
                got = docs_cache[t] = np.unique(np.concatenate(ds))
            return got

        for qid, terms in queries:
            if any_match:
                present = [t for t in terms if t in tb]
                if not present:
                    continue
                cur = np.unique(np.concatenate([docs_of(t) for t in present]))
            else:
                if any(t not in tb for t in terms):
                    continue
                cur = None
                for t in terms:
                    d = docs_of(t)
                    cur = d if cur is None else cur[np.isin(cur, d, assume_unique=True)]
                    if cur is not None and not len(cur):
                        break
            if cur is None or not len(cur):
                continue
            if excl_arr is not None and len(excl_arr):
                cur = cur[~np.isin(cur, excl_arr)]
            for doc in cur[:k]:
                out_q.append(qid)
                out_d.append(int(doc))
    yield pa.RecordBatch.from_pydict(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "doc_id": pa.array(out_d, type=pa.int64()),
        }
    )


def constant_score_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    boost: float = 1.0,
) -> DataFrame:
    """(query_id, rank, doc_id, score): the ES/Lucene
    ``constant_score`` query — the wrapped query runs in FILTER
    context (here: AND over the query's unique terms, the bool-filter
    shape), every matching doc scores exactly ``boost``, and hits come
    back in index order (doc_id asc; with one uniform score that IS
    the ES tie order). No idf/tf/norms are computed or read — which is
    the point of the ES construct: a filter wrapped for use in scoring
    position, at cache-friendly cost.

    Scale shape: identical to ``conjunctive_topk`` minus the math —
    term-filtered scan of the postings (row-group pushdown), per-shard
    kernel emits <= k candidates, global k-smallest window over
    queries x shards x k rows. A query with an out-of-vocabulary term
    matches nothing (AND semantics)."""
    qterm_map: list[tuple[int, list[str]]] = []
    all_terms: set[str] = set()
    for qid, q in queries:
        seen: list[str] = []
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.append(tok)
        if seen:
            qterm_map.append((qid, seen))
            all_terms.update(seen)
    spark = index.postings.sparkSession
    if not qterm_map:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    needed = [
        "term", "shard", "block_id", "first_doc", "last_doc",
        "n_docs", "max_tf", "min_dl", "docs_bin", "tfs_bin", "dls_bin",
    ]
    if "seg" in index.postings.columns:
        needed.append("seg")
    filtered = index.postings.select(*needed).filter(
        F.col("term").isin(list(all_terms))
    )
    n_parts = spark.sparkContext.defaultParallelism
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _filter_partition(it, qterm_map, k, excl, vers),
        "query_id long, doc_id long",
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("query_id").orderBy(F.asc("doc_id"))
    return (
        per_shard.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id",
            F.lit(float(boost)).alias("score"),
        )
    )


def terms_lookup_topk(
    index: InvertedIndex,
    docs: DataFrame,
    lookups: list[tuple[int, int]],
    k: int = 10,
    boost: float = 1.0,
    max_terms: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score): the Elasticsearch TERMS LOOKUP
    query — the term set is fetched from a SEED document (ES: index /
    id / path) instead of arriving in the request, and docs containing
    ANY of those terms match at constant score ``boost`` in index
    order (doc_id asc — the ES tie order under one uniform score).
    The seed document matches itself, as in ES. Seeds whose
    distinct-term count exceeds ``max_terms`` raise, mirroring the ES
    ``index.max_terms_count`` guard rather than silently truncating.

    ``lookups`` = (query_id, seed_doc_id) pairs; seed terms are the
    index's own tokenization of the seed's ``text_col``.

    Scale shape: the seed fetch is one id-pruned scan collecting
    n_seeds token arrays (driver-side, bounded by max_terms each);
    matching reuses the constant-score filter kernel in ANY mode —
    term-pruned postings scan, per-shard <= k smallest doc_ids, global
    k-smallest window. Nothing corpus-sized reaches the driver."""
    from ..functions.udfs import tokenize_for_scoring  # noqa: PLC0415

    seeds = sorted({d for _, d in lookups})
    if not seeds:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    rows = (
        docs.filter(F.col(id_col).isin(seeds))
        .select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(tokenize_for_scoring(F.col(text_col))).alias("toks"),
        )
        .collect()
    )
    terms_by_seed = {r["doc_id"]: list(r["toks"]) for r in rows}
    for sid, ts in terms_by_seed.items():
        if len(ts) > max_terms:
            raise ValueError(
                f"seed doc {sid} has {len(ts)} distinct terms > max_terms={max_terms}"
            )
    qterm_map = [
        (qid, terms_by_seed[seed])
        for qid, seed in lookups
        if terms_by_seed.get(seed)
    ]
    all_terms = sorted({t for _, ts in qterm_map for t in ts})
    spark = index.postings.sparkSession
    if not qterm_map:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    needed = [
        "term", "shard", "block_id", "first_doc", "last_doc",
        "n_docs", "max_tf", "min_dl", "docs_bin", "tfs_bin", "dls_bin",
    ]
    if "seg" in index.postings.columns:
        needed.append("seg")
    filtered = index.postings.select(*needed).filter(
        F.col("term").isin(all_terms)
    )
    n_parts = spark.sparkContext.defaultParallelism
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _filter_partition(it, qterm_map, k, excl, vers, any_match=True),
        "query_id long, doc_id long",
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("query_id").orderBy(F.asc("doc_id"))
    return (
        per_shard.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id",
            F.lit(float(boost)).alias("score"),
        )
    )
