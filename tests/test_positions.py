"""Positional index + phrase retrieval: codec round-trip, duplicate
collapse, and phrase_topk pinned against the declarative brute-force
plan (which is itself the shape of the DuckDB oracle)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from embed_rerank_spark.operators.positions import (
    build_positional_postings,
    decode_positional_block,
    encode_grouped_rows_pos,
    load_positional_index,
    phrase_topk,
    phrase_topk_bruteforce,
    segment_cumsum,
)

PHRASES = [
    (1, "fast table"),
    (2, "sort merge"),
    (3, "the a"),
    (4, "hash join"),
    (5, "value fast slow"),  # 3-gram, may be rare/absent
    (6, "zyzzyva missing"),  # term absent from corpus -> empty
    (7, "the the"),  # duplicated token
    (8, "scan"),  # single-word phrase == term match
]


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_segment_cumsum_roundtrip():
    rng = np.random.default_rng(7)
    segs = [np.sort(rng.choice(5000, size=n, replace=False)) for n in (1, 5, 17, 3)]
    flat = np.concatenate(segs)
    starts = np.concatenate(([0], np.cumsum([len(s) for s in segs])[:-1]))
    deltas = flat.astype(np.uint64).copy()
    deltas[1:] = flat[1:].astype(np.uint64) - flat[:-1].astype(np.uint64)
    deltas[starts] = flat[starts].astype(np.uint64)
    out = segment_cumsum(deltas, starts)
    assert (out == flat).all()


def _encode_rows(rows):
    """rows: (term, shard, doc, tf, dl, positions list). Pre-sorted by
    (term, shard, doc)."""
    terms = sorted({r[0] for r in rows})
    tdict = pa.array(terms)
    tmap = {t: i for i, t in enumerate(terms)}
    tidx = np.array([tmap[r[0]] for r in rows], dtype=np.int64)
    shard = np.array([r[1] for r in rows], dtype=np.int64)
    doc = np.array([r[2] for r in rows], dtype=np.int64)
    tf = np.array([r[3] for r in rows], dtype=np.int64)
    dl = np.array([r[4] for r in rows], dtype=np.int64)
    flat = np.array([p for r in rows for p in r[5]], dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum([len(r[5]) for r in rows]))).astype(np.int64)
    return list(
        encode_grouped_rows_pos(tdict, tidx, shard, doc, tf, dl, flat, offs, 4)
    )


def test_positional_encode_decode_roundtrip():
    rows = [
        ("a", 0, 10, 2, 9, [1, 5]),
        ("a", 0, 20, 1, 4, [0]),
        ("a", 0, 30, 3, 12, [2, 3, 11]),
        ("a", 0, 40, 1, 5, [4]),
        ("a", 0, 55, 2, 7, [0, 6]),  # second block (block_size=4)
        ("b", 1, 20, 1, 4, [3]),
    ]
    batches = _encode_rows(rows)
    tbl = pa.Table.from_batches(batches).to_pylist()
    # group (a, 0) spans 2 blocks; (b, 1) one block
    assert [(r["term"], r["shard"], r["block_id"]) for r in tbl] == [
        ("a", 0, 0), ("a", 0, 1), ("b", 1, 0)
    ]
    docs, tfs, dls, pf, po = decode_positional_block(
        tbl[0]["docs_bin"], tbl[0]["tfs_bin"], tbl[0]["dls_bin"],
        tbl[0]["pos_bin"], tbl[0]["n_docs"],
    )
    assert list(docs) == [10, 20, 30, 40]
    assert list(tfs) == [2, 1, 3, 1]
    assert [list(pf[po[i] : po[i + 1]]) for i in range(4)] == [
        [1, 5], [0], [2, 3, 11], [4]
    ]
    docs2, tfs2, _dls2, pf2, po2 = decode_positional_block(
        tbl[1]["docs_bin"], tbl[1]["tfs_bin"], tbl[1]["dls_bin"],
        tbl[1]["pos_bin"], tbl[1]["n_docs"],
    )
    assert list(docs2) == [55] and list(pf2) == [0, 6]


def test_positional_duplicate_docs_collapse_to_winner():
    """Duplicate (term, shard, doc) rows keep the max-(tf, dl) row's
    tf AND its positions — consistent with the non-positional
    encoder's max-tf collapse."""
    rows = [
        ("a", 0, 10, 1, 4, [2]),
        ("a", 0, 10, 3, 9, [0, 1, 7]),  # winner
        ("a", 0, 10, 2, 9, [5, 6]),
        ("a", 0, 20, 1, 4, [3]),
    ]
    batches = _encode_rows(rows)
    tbl = pa.Table.from_batches(batches).to_pylist()
    assert len(tbl) == 1
    docs, tfs, dls, pf, po = decode_positional_block(
        tbl[0]["docs_bin"], tbl[0]["tfs_bin"], tbl[0]["dls_bin"],
        tbl[0]["pos_bin"], tbl[0]["n_docs"],
    )
    assert list(docs) == [10, 20]
    assert list(tfs) == [3, 1]
    assert list(dls) == [9, 4]
    assert [list(pf[po[i] : po[i + 1]]) for i in range(2)] == [[0, 1, 7], [3]]


@pytest.fixture(scope="module")
def pos_index(spark):
    built = build_positional_postings(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), n_shards=4
    )
    return load_positional_index(built)


def test_phrase_topk_matches_bruteforce(spark, pos_index):
    docs = _docs(spark)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
        for r in phrase_topk(pos_index, PHRASES, k=10).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
        for r in phrase_topk_bruteforce(spark, docs, PHRASES, k=10).collect()
    }
    assert got == want
    assert want, "phrase fixture produced no matches at all"
    assert not any(q == 6 for q, _ in want)  # absent term -> no rows


def test_phrase_match_is_true_consecutiveness(spark, pos_index):
    """Every returned doc really contains the phrase consecutively;
    single-word phrase degenerates to plain term match."""
    docs = {r["doc_id"]: r["text"] for r in _docs(spark).collect()}
    out = phrase_topk(pos_index, PHRASES, k=10).collect()
    assert out
    for r in out:
        phrase = dict(PHRASES)[r["query_id"]]
        needle = " " + " ".join(phrase.strip().lower().split()) + " "
        joined = " " + " ".join(docs[r["doc_id"]].strip().lower().split()) + " "
        assert needle in joined


def test_positional_postings_salted_build_same_results(spark):
    """Range salts split hot-term runs; phrase results must not change."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = load_positional_index(build_positional_postings(docs, n_shards=4, n_salts=1))
    b = load_positional_index(build_positional_postings(docs, n_shards=4, n_salts=4))
    ra = sorted(map(tuple, phrase_topk(a, PHRASES, k=10).collect()))
    rb = sorted(map(tuple, phrase_topk(b, PHRASES, k=10).collect()))
    assert ra == rb


def test_phrase_snippets_contain_phrase(spark, pos_index):
    """Every snippet contains the phrase; first_pos is the EARLIEST
    occurrence (token before it, if any, does not start the phrase)."""
    from embed_rerank_spark.operators.positions import phrase_snippets

    docs = _docs(spark)
    out = phrase_snippets(pos_index, docs, PHRASES, k=10, context=3).collect()
    assert out
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        phrase = " ".join(dict(PHRASES)[r["query_id"]].strip().lower().split())
        assert phrase in r["snippet"], (phrase, r["snippet"])
        toks = texts[r["doc_id"]].strip().lower().split()
        p = r["first_pos"]
        plen = len(phrase.split())
        assert toks[p : p + plen] == phrase.split()
        joined = " " + " ".join(toks) + " "
        first = joined.index(" " + phrase + " ")
        assert joined[:first].count(" ") == p  # earliest hit


def test_proximity_topk_matches_python_bruteforce(spark, pos_index):
    """NEAR/W semantics pinned against a pure-Python check: docs where
    the two terms occur within W tokens (distinct occurrences, either
    order), BM25 over the pair's unique terms, engine tie order."""
    import math

    from embed_rerank_spark.operators.positions import proximity_topk

    PAIRS = [
        (1, "fast", "table"),
        (2, "hash", "join"),
        (3, "the", "zyzzyva"),  # OOV -> empty
        (4, "scan", "scan"),  # same term: needs two occurrences
    ]
    W = 3
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
        for r in proximity_topk(pos_index, PAIRS, k=10, window=W).collect()
    }

    docs = [(r["doc_id"], r["text"].strip().lower().split()) for r in _docs(spark).collect()]
    docs = [(d, t) for d, t in docs if t]
    n = len(docs)
    avgdl = sum(len(t) for _d, t in docs) / n
    from collections import Counter

    dfs: Counter = Counter()
    for _d, t in docs:
        dfs.update(set(t))

    want = {}
    for qid, a, b in PAIRS:
        if dfs[a] == 0 or dfs[b] == 0:
            continue
        scored = []
        for d, toks in docs:
            pa_ = [i for i, t in enumerate(toks) if t == a]
            pb_ = [i for i, t in enumerate(toks) if t == b]
            if not any(
                p1 != p2 and abs(p1 - p2) <= W for p1 in pa_ for p2 in pb_
            ):
                continue
            score = 0.0
            for t in dict.fromkeys((a, b)):
                tf = toks.count(t)
                idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
                score += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
            scored.append((d, score))
        scored.sort(key=lambda x: (-round(x[1], 6), x[0]))
        for rk, (d, s) in enumerate(scored[:10], 1):
            want[(qid, rk)] = (d, round(s, 6))

    assert got == want
    assert any(q == 4 for q, _ in got), "same-term proximity found no docs"
    assert not any(q == 3 for q, _ in got)


def test_incremental_positional_build_and_merge(spark, tmp_path_factory):
    """Snapshot-segment positional build + vectorized positional merge:
    the merged index answers phrase AND WAND queries identically to a
    one-shot positional build over the same corpus (merge kernel must
    preserve positions through the permutation), and mixing positional
    with plain segments is rejected."""
    from pyspark.sql import functions as F

    from embed_rerank_spark.operators.wand import wand_topk
    from embed_rerank_spark.plans.build_index import (
        build_index,
        build_segment,
        extract_pages,
    )
    from embed_rerank_spark.sources.pages import generate_pages

    path = str(tmp_path_factory.mktemp("posinc"))
    pages = generate_pages(spark, 900, seed=31, n_snapshots=3).cache()
    idx = build_index(
        spark, pages, path, n_shards=4, block_size=32, n_salts=2, positional=True
    )
    assert "pos_bin" in idx.postings.columns

    corpus = (
        extract_pages(pages).filter(F.col("error").isNull()).select("doc_id", "text")
    )
    oneshot = load_positional_index(
        build_positional_postings(corpus, n_shards=4, block_size=32, n_salts=2)
    )
    PH = [(1, "the w12"), (2, "w7 w40"), (3, "w3")]
    got = sorted(map(tuple, phrase_topk(idx, PH, k=8).collect()))
    want = sorted(map(tuple, phrase_topk(oneshot, PH, k=8).collect()))
    assert got == want and got

    QW = [(1, "the w12 w700"), (2, "w55 w1000")]
    gw = sorted(map(tuple, wand_topk(idx, QW, k=8).collect()))
    ww = sorted(map(tuple, wand_topk(oneshot, QW, k=8).collect()))
    assert gw == ww and gw

    # mixing positional and plain segments must be rejected at merge
    import pytest as _pytest

    day = "2099-01-01"
    build_segment(
        spark,
        generate_pages(spark, 50, seed=32, n_snapshots=1).withColumn(
            "warc_ts", F.to_timestamp(F.lit(day))
        ),
        path,
        day,
        n_shards=4,
        block_size=32,
        n_salts=2,
        positional=False,
    )
    from embed_rerank_spark.plans.build_index import merge_segments

    with _pytest.raises(ValueError, match="mix positional"):
        merge_segments(spark, path, block_size=32, n_salts=2)


def test_phrase_over_tiered_units_and_positional_compaction(
    spark, tmp_path_factory
):
    """Phrase retrieval over the LIVE multi-unit (tiered) view must
    equal a one-shot positional build (per-term re-sort + dedupe of
    interleaved unit runs), and tiered compaction of positional units
    keeps pos_bin (positional-aware kernel) so results are unchanged
    after compacting."""
    from pyspark.sql import functions as F

    from embed_rerank_spark.plans.build_index import (
        build_incremental,
        extract_pages,
    )
    from embed_rerank_spark.plans.tiered import compact, load_tiered
    from embed_rerank_spark.sources.pages import generate_pages

    path = str(tmp_path_factory.mktemp("postier"))
    pages = generate_pages(spark, 900, seed=37, n_snapshots=4).cache()
    build_incremental(
        spark, pages, path, n_shards=4, block_size=32, positional=True
    )
    corpus = (
        extract_pages(pages).filter(F.col("error").isNull()).select("doc_id", "text")
    )
    oneshot = load_positional_index(
        build_positional_postings(corpus, n_shards=4, block_size=32)
    )
    PH = [(1, "the w12"), (2, "w7 w40"), (3, "w3")]

    tiered_idx = load_tiered(spark, path)  # 4 live L0 units
    got = sorted(map(tuple, phrase_topk(tiered_idx, PH, k=8).collect()))
    want = sorted(map(tuple, phrase_topk(oneshot, PH, k=8).collect()))
    assert got == want and got

    created = compact(spark, path, fanout=4)  # -> one positional L1
    assert created
    compacted_idx = load_tiered(spark, path)
    assert "pos_bin" in compacted_idx.postings.columns
    got2 = sorted(map(tuple, phrase_topk(compacted_idx, PH, k=8).collect()))
    assert got2 == want


def test_positional_codec_randomized_roundtrip():
    """Randomized positional encode/decode: arbitrary group shapes,
    doc gaps spanning the int64 range, tf up to 50, positions sparse
    over large documents — every block must round-trip exactly."""
    rng = np.random.default_rng(101)
    for _trial in range(25):
        n_groups = rng.integers(1, 5)
        rows = []
        for g in range(int(n_groups)):
            term = f"t{g % 3}"
            shard = int(g // 3)
            n_docs_g = int(rng.integers(1, 40))
            # doc ids spanning the signed-int64 range, strictly asc
            docs = np.unique(
                rng.integers(-(2**62), 2**62, size=n_docs_g, dtype=np.int64)
            )
            for d in docs:
                tf = int(rng.integers(1, 50))
                dl = int(rng.integers(tf, tf + 5000))
                pos = np.sort(
                    rng.choice(np.arange(dl, dtype=np.int64), size=tf, replace=False)
                )
                rows.append((term, shard, int(d), tf, dl, pos.tolist()))
        rows.sort(key=lambda r: (r[0], r[1], r[2]))
        block_size = int(rng.choice([1, 3, 7, 128]))

        terms = sorted({r[0] for r in rows})
        tdict = pa.array(terms)
        tmap = {t: i for i, t in enumerate(terms)}
        tidx = np.array([tmap[r[0]] for r in rows], dtype=np.int64)
        shard = np.array([r[1] for r in rows], dtype=np.int64)
        doc = np.array([r[2] for r in rows], dtype=np.int64)
        tf = np.array([r[3] for r in rows], dtype=np.int64)
        dl = np.array([r[4] for r in rows], dtype=np.int64)
        flat = np.array([p for r in rows for p in r[5]], dtype=np.int64)
        offs = np.concatenate(([0], np.cumsum([len(r[5]) for r in rows]))).astype(
            np.int64
        )
        batches = list(
            encode_grouped_rows_pos(
                tdict, tidx, shard, doc, tf, dl, flat, offs, block_size
            )
        )
        got = []
        for blk in pa.Table.from_batches(batches).to_pylist():
            d, f, l, pf, po = decode_positional_block(
                blk["docs_bin"], blk["tfs_bin"], blk["dls_bin"],
                blk["pos_bin"], blk["n_docs"],
            )
            for i in range(len(d)):
                got.append(
                    (
                        blk["term"], blk["shard"], int(d[i]), int(f[i]), int(l[i]),
                        [int(x) for x in pf[po[i] : po[i + 1]]],
                    )
                )
        got.sort(key=lambda r: (r[0], r[1], r[2]))
        want = sorted(
            ((t, s, d_, tf_, dl_, list(map(int, p))) for t, s, d_, tf_, dl_, p in rows),
            key=lambda r: (r[0], r[1], r[2]),
        )
        assert got == want


def test_ordered_proximity_matches_python_bruteforce(spark, pos_index):
    """Span-near (inOrder) semantics: t1 must PRECEDE t2 within W;
    asymmetric — the reversed pair retrieves a different doc set."""
    import math
    from collections import Counter

    from embed_rerank_spark.operators.positions import proximity_topk

    PAIRS = [
        (1, "fast", "table"),
        (2, "table", "fast"),  # reversed: different matches
        (3, "hash", "join"),
        (4, "scan", "scan"),  # same term: side='right' probe must skip self
    ]
    W = 3
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
        for r in proximity_topk(
            pos_index, PAIRS, k=10, window=W, ordered=True
        ).collect()
    }

    docs = [(r["doc_id"], r["text"].strip().lower().split()) for r in _docs(spark).collect()]
    docs = [(d, t) for d, t in docs if t]
    n = len(docs)
    avgdl = sum(len(t) for _d, t in docs) / n
    dfs: Counter = Counter()
    for _d, t in docs:
        dfs.update(set(t))

    want = {}
    match_sets = {}
    for qid, a, b in PAIRS:
        scored = []
        matched = set()
        for d, toks in docs:
            pa_ = [i for i, t in enumerate(toks) if t == a]
            pb_ = [i for i, t in enumerate(toks) if t == b]
            if not any(0 < p2 - p1 <= W for p1 in pa_ for p2 in pb_):
                continue
            matched.add(d)
            score = 0.0
            for t in dict.fromkeys((a, b)):
                tf = toks.count(t)
                idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
                score += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
            scored.append((d, score))
        scored.sort(key=lambda x: (-round(x[1], 6), x[0]))
        for rk, (d, s) in enumerate(scored[:10], 1):
            want[(qid, rk)] = (d, round(s, 6))
        match_sets[qid] = matched

    assert got == want
    assert match_sets[1] != match_sets[2], "ordered NEAR must be asymmetric"


def test_span_first_semantics(spark):
    from embed_rerank_spark.operators.positions import (
        build_positional_postings,
        load_positional_index,
        span_first_topk,
    )

    rows = [
        (1, "scan late words here"),       # scan at pos 0
        (2, "a b c d scan after limit"),   # scan at pos 4
        (3, "x y scan z"),                 # scan at pos 2
        (4, "no match here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = load_positional_index(build_positional_postings(docs, n_shards=2))
    # limit 3: first_pos < 3 qualifies -> docs 1 (pos 0) and 3 (pos 2)
    got = {r["doc_id"] for r in span_first_topk(idx, [(1, "scan")], limit=3).collect()}
    assert got == {1, 3}
    # limit 5 admits doc 2 as well
    got5 = {r["doc_id"] for r in span_first_topk(idx, [(1, "scan")], limit=5).collect()}
    assert got5 == {1, 2, 3}
    # OOV term -> no rows; empty plan -> empty frame with the schema
    assert span_first_topk(idx, [(1, "zyzzyva")], limit=3).count() == 0
    assert span_first_topk(idx, [], limit=3).count() == 0


def test_span_first_scores_match_bm25(spark):
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
    from embed_rerank_spark.operators.positions import (
        build_positional_postings,
        load_positional_index,
        span_first_topk,
    )

    docs = _docs(spark)
    idx = load_positional_index(build_positional_postings(docs, n_shards=4))
    # a huge limit admits every occurrence: span_first == plain BM25
    got = {
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in span_first_topk(idx, [(1, "scan")], k=10, limit=10_000).collect()
    }
    want = {
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in bm25_topk_bruteforce(spark, docs, [(1, "scan")], k=10).collect()
    }
    assert got == want


def test_match_phrase_prefix_semantics(spark):
    from embed_rerank_spark.operators.positions import (
        build_positional_postings,
        load_positional_index,
        match_phrase_prefix_topk,
        phrase_topk,
    )

    rows = [
        (1, "fast table scan here"),      # "fast ta*" -> table
        (2, "fast tables only"),          # -> tables
        (3, "a fast tank rolled"),        # -> tank
        (4, "fast cars no t words"),      # no match
        (5, "table fast reversed"),       # wrong order -> no match
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = load_positional_index(build_positional_postings(docs, n_shards=2))
    got = {r["doc_id"] for r in match_phrase_prefix_topk(idx, [(1, "fast ta*")]).collect()}
    assert got == {1, 2, 3}
    # dis-max: each matched doc scores as the best full phrase;
    # doc 1's score must equal phrase_topk("fast table") on doc 1
    mpp = {r["doc_id"]: r["score"] for r in match_phrase_prefix_topk(idx, [(1, "fast ta*")]).collect()}
    ph = {r["doc_id"]: r["score"] for r in phrase_topk(idx, [(1, "fast table")]).collect()}
    assert abs(mpp[1] - ph[1]) < 1e-9
    # no-expansion prefix and malformed queries -> empty
    assert match_phrase_prefix_topk(idx, [(1, "fast zz*")]).count() == 0
    assert match_phrase_prefix_topk(idx, [(1, "fast table")]).count() == 0
    assert match_phrase_prefix_topk(idx, [(1, "*")]).count() == 0


def test_match_phrase_prefix_single_position_and_cap(spark):
    from embed_rerank_spark.operators.positions import (
        build_positional_postings,
        load_positional_index,
        match_phrase_prefix_topk,
    )
    from embed_rerank_spark.operators.wand import expand_prefix, wand_topk

    docs = _docs(spark)
    idx = load_positional_index(build_positional_postings(docs, n_shards=4))
    # bare prefix query degenerates to "any doc containing an expansion,
    # scored as the best single-term BM25"
    out = match_phrase_prefix_topk(idx, [(1, "sc*")], k=5).collect()
    assert len(out) == 5 and all(r["rank"] == i + 1 for i, r in enumerate(out))
    # max_expansion=1 keeps only the highest-df expansion: the query
    # then equals a plain single-term BM25 on that expansion
    top1 = expand_prefix(idx, "s", 1)
    capped = match_phrase_prefix_topk(idx, [(1, "s*")], k=5, max_expansion=1).collect()
    single = wand_topk(idx, [(1, top1[0])], k=5).collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in capped] == [
        (r["doc_id"], round(r["score"], 6)) for r in single
    ]


@pytest.fixture(scope="module")
def nw_index(spark):
    from embed_rerank_spark.operators.positions import build_nextword_postings

    built = build_nextword_postings(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), n_shards=4
    )
    return load_positional_index(built)


def test_phrase_nextword_identical_to_unigram_path(spark, pos_index, nw_index):
    """The next-word path is exact: same (rank, doc, score, first_pos)
    as phrase_topk on every PHRASES shape — 3-gram, duplicated token,
    OOV (empty), and the single-token fallback."""
    from embed_rerank_spark.operators.positions import phrase_topk_nextword

    want = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9), r["first_pos"])
        for r in phrase_topk(pos_index, PHRASES, k=10).collect()
    }
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9), r["first_pos"])
        for r in phrase_topk_nextword(pos_index, nw_index, PHRASES, k=10).collect()
    }
    assert got == want
    assert any(q == 8 for q, _ in got)  # single-token fallback produced rows
    assert not any(q == 6 for q, _ in got)


def test_nextword_supertoken_positions_are_first_token_positions(spark):
    """Bigram postings: the supertoken's positions equal the first
    token's positions where the pair is adjacent, tf = adjacency
    count (overlaps included: 'b b b' has 'b b' at 0 and 1)."""
    from embed_rerank_spark.operators.positions import (
        NEXTWORD_JOINER,
        build_nextword_postings,
        load_termdata,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b b b"), (3, "solo")],
        "doc_id long, text string",
    )
    built = build_nextword_postings(docs, n_shards=1)
    batches = built["postings"]._collect_as_arrow()
    shards = load_termdata(iter(batches))
    td = shards[list(shards)[0]]
    ab = td["a" + NEXTWORD_JOINER + "b"]
    d1 = int(np.searchsorted(ab[0], 1))
    assert ab[1][d1] == 2  # 'a b' at positions 0 and 2
    po = ab[4]
    assert list(ab[3][po[d1] : po[d1 + 1]]) == [0, 2]
    bb = td["b" + NEXTWORD_JOINER + "b"]
    assert list(bb[1]) == [2]  # doc 2: overlapping 'b b' at 0 and 1
    assert list(bb[3]) == [0, 1]
    # a single-token doc contributes no bigrams at all
    assert not any(k.startswith("solo") for k in td)


def test_phrase_nextword_respects_tombstones(spark, nw_index):
    """Deletion tombstones on the unigram handle mask next-word
    results exactly as on the unigram path."""
    import dataclasses

    from embed_rerank_spark.operators.positions import phrase_topk_nextword

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = load_positional_index(build_positional_postings(docs, n_shards=4))
    full = phrase_topk_nextword(base, nw_index, [(1, "sort merge")], k=5).collect()
    assert full
    dead = {r["doc_id"] for r in full[:2]}
    masked = dataclasses.replace(base, tombstones=frozenset(dead))
    got = {
        r["doc_id"]
        for r in phrase_topk_nextword(masked, nw_index, [(1, "sort merge")], k=5).collect()
    }
    assert got and not (got & dead)


def test_phrase_combined_index_identical_and_shuffle_free(spark, pos_index, tmp_path_factory):
    """The combined (unigram + supertoken) index answers phrases
    identically to both other paths, its stats are the unigram
    corpus's, and written shard-file the phrase plan has NO exchange
    after the scan."""
    from embed_rerank_spark.operators.positions import (
        build_combined_phrase_index,
        phrase_topk_nextword,
    )
    from embed_rerank_spark.operators.postings import InvertedIndex, write_index

    docs = _docs(spark)
    out = str(tmp_path_factory.mktemp("combined_idx"))
    write_index(build_combined_phrase_index(docs, n_shards=4), out)
    comb = InvertedIndex.load(spark, out)
    assert comb.n_docs == pos_index.n_docs
    assert abs(comb.avgdl - pos_index.avgdl) < 1e-9
    want = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in phrase_topk(pos_index, PHRASES, k=10).collect()
    }
    plan_df = phrase_topk_nextword(comb, None, PHRASES, k=10)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in plan_df.collect()
    }
    assert got == want
    # shuffle-free kernel: no shard repartition feeding the scan
    assert comb.shard_files and comb.whole_shard_scan_ok()
    plan = plan_df._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning(shard" not in plan


def test_sort_dedupe_nopos_matches_positional_winner_rule():
    """Score-only (skip_pos) termdata from interleaved multi-unit
    blocks: same sort + max-(tf, dl) duplicate collapse as the
    positional dedupe, empty positions."""
    from embed_rerank_spark.operators.positions import (
        _sort_dedupe_nopos,
        _sort_dedupe_termdata,
    )

    docs = np.array([5, 1, 9, 5, 1], dtype=np.int64)
    tf = np.array([2, 3, 1, 4, 1], dtype=np.int64)
    dl = np.array([10, 10, 10, 10, 10], dtype=np.int64)
    d, t, l, pf, po = _sort_dedupe_nopos(docs.copy(), tf.copy(), dl.copy())
    assert list(d) == [1, 5, 9]
    assert list(t) == [3, 4, 1]  # max-tf winner per duplicate run
    assert pf.size == 0 and len(po) == len(d) + 1
    # parity with the positional dedupe on docs/tf/dl
    pos_pf = np.arange(int(tf.sum()), dtype=np.int64)
    pos_po = np.concatenate(([0], np.cumsum(tf)))
    d2, t2, l2, _pf2, _po2 = _sort_dedupe_termdata(
        docs.copy(), tf.copy(), dl.copy(), pos_pf, pos_po
    )
    assert list(d2) == list(d) and list(t2) == list(t) and list(l2) == list(l)


def test_span_not_semantics(spark):
    """SpanNot truth table on a hand corpus: blocked-by-window,
    free-occurrence, no-exclude-in-doc, OOV exclude, self-exclusion."""
    from embed_rerank_spark.operators.positions import span_not_topk

    docs = spark.createDataFrame(
        [
            (1, "apple pie on the table"),          # pie 1 after apple: blocked
            (2, "apple sauce and more apple pie"),  # first apple is >3 from pie
            (3, "apple orchard in autumn"),         # no pie at all
            (4, "pie pie pie apple pie"),           # surrounded: blocked
            (5, "no fruit here"),
        ],
        "doc_id long, text string",
    )
    from embed_rerank_spark.operators.positions import (
        build_positional_postings,
        load_positional_index,
    )

    idx = load_positional_index(build_positional_postings(docs, n_shards=2))
    got = {r.doc_id for r in span_not_topk(
        idx, [(0, "apple", "pie")], k=10, window=3
    ).collect()}
    assert got == {2, 3}
    # OOV exclude never blocks: plain term query over 'apple'
    got2 = {r.doc_id for r in span_not_topk(
        idx, [(0, "apple", "zzzunseen")], k=10, window=3
    ).collect()}
    assert got2 == {1, 2, 3, 4}
    # self-exclusion: every occurrence blocks itself at gap 0
    assert span_not_topk(idx, [(0, "apple", "apple")], k=10).count() == 0
    # OOV include -> no rows
    assert span_not_topk(idx, [(0, "zzz", "pie")], k=10).count() == 0


def test_sloppy_phrase_matches_python_bruteforce(spark, pos_index):
    """ES match_phrase+slop semantics pinned against pure Python: doc
    matches iff some occurrence pair has ``1 - slop <= p2 - p1 <=
    1 + slop`` (Lucene two-term move cost), excluding the probe's own
    occurrence for a same-term pair; BM25 over the pair's distinct
    terms, engine tie order."""
    import math

    from embed_rerank_spark.operators.positions import sloppy_phrase_topk
    from embed_rerank_spark.queryset import SLOPPY_PHRASE_SET

    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
        for r in sloppy_phrase_topk(pos_index, SLOPPY_PHRASE_SET, k=10).collect()
    }

    docs = [
        (r["doc_id"], r["text"].strip().lower().split())
        for r in _docs(spark).collect()
    ]
    docs = [(d, t) for d, t in docs if t]
    n = len(docs)
    avgdl = sum(len(t) for _d, t in docs) / n
    from collections import Counter

    dfs: Counter = Counter()
    for _d, t in docs:
        dfs.update(set(t))

    want = {}
    for qid, t1, t2, slop in SLOPPY_PHRASE_SET:
        if dfs[t1] == 0 or dfs[t2] == 0:
            continue
        scored = []
        for d, toks in docs:
            p1s = [i for i, t in enumerate(toks) if t == t1]
            p2s = [i for i, t in enumerate(toks) if t == t2]
            if not any(
                1 - slop <= p2 - p1 <= 1 + slop
                and not (t1 == t2 and p1 == p2)
                for p1 in p1s
                for p2 in p2s
            ):
                continue
            score = 0.0
            for t in dict.fromkeys((t1, t2)):
                tf = toks.count(t)
                idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
                score += idf * (tf * 2.2) / (
                    tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl)
                )
            scored.append((d, score))
        scored.sort(key=lambda x: (-round(x[1], 6), x[0]))
        for rk, (d, s) in enumerate(scored[:10], 1):
            want[(qid, rk)] = (d, round(s, 6))

    assert got == want
    assert any(q == 5 for q, _ in got), "same-term sloppy pair found no docs"
    assert not any(q == 6 for q, _ in got), "OOV term must empty the query"


def test_sloppy_phrase_slop0_equals_exact_phrase(spark, pos_index):
    """slop=0 degenerates to the exact two-token phrase."""
    from embed_rerank_spark.operators.positions import sloppy_phrase_topk

    cols = ["query_id", "rank", "doc_id", "score"]
    a = sorted(
        map(
            tuple,
            sloppy_phrase_topk(pos_index, [(1, "hash", "join", 0)], k=10)
            .select(*cols)
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            phrase_topk(pos_index, [(1, "hash join")], k=10).select(*cols).collect(),
        )
    )
    assert a == b and a


def test_sloppy_phrase_negative_slop_raises(pos_index):
    from embed_rerank_spark.operators.positions import sloppy_phrase_topk

    with pytest.raises(ValueError):
        sloppy_phrase_topk(pos_index, [(1, "a", "b", -1)], k=5)


def test_span_containing_within_semantics(spark):
    """SpanContaining/SpanWithin truth table on a hand corpus:
    contained little, little outside the span, ordered-only big,
    missing big edge, OOV little; within == same docs, little-term
    scores."""
    from embed_rerank_spark.operators.positions import (
        build_positional_postings,
        load_positional_index,
        span_containing_topk,
        span_within_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple tart with cherry pie inside"),  # apple..pie gap 4, cherry inside
            (2, "apple pie cherry"),                   # cherry AFTER the span
            (3, "cherry apple then pie"),              # cherry BEFORE the span
            (4, "apple cherry only"),                  # no pie: no big span
            (5, "pie cherry apple"),                   # unordered: no big span
        ],
        "doc_id long, text string",
    )
    idx = load_positional_index(build_positional_postings(docs, n_shards=2))

    got = {r.doc_id for r in span_containing_topk(
        idx, [(0, "apple", "pie", "cherry")], k=10, window=4
    ).collect()}
    assert got == {1}
    # little == big-start: contained wherever any ordered span exists
    got2 = {r.doc_id for r in span_containing_topk(
        idx, [(0, "apple", "pie", "apple")], k=10, window=4
    ).collect()}
    assert got2 == {1, 2, 3}
    # window too small kills the gap-4 span
    got3 = {r.doc_id for r in span_containing_topk(
        idx, [(0, "apple", "pie", "cherry")], k=10, window=3
    ).collect()}
    assert got3 == set()
    # OOV little / OOV big edge -> zero rows
    assert span_containing_topk(
        idx, [(0, "apple", "pie", "zzz")], k=10, window=4
    ).count() == 0
    assert span_containing_topk(
        idx, [(0, "zzz", "pie", "cherry")], k=10, window=4
    ).count() == 0

    # within: same doc-level match, scored over the little term alone
    cont = {(r.doc_id, r.score) for r in span_containing_topk(
        idx, [(0, "apple", "pie", "cherry")], k=10, window=4
    ).collect()}
    with_ = {(r.doc_id, r.score) for r in span_within_topk(
        idx, [(0, "apple", "pie", "cherry")], k=10, window=4
    ).collect()}
    assert {d for d, _ in cont} == {d for d, _ in with_} == {1}
    # containing sums two terms, within one -> scores differ
    assert cont != with_


def test_span_containing_matches_python_bruteforce(spark):
    """Randomized span-containing semantics pinned against a direct
    Python scan: exists p1 < p2 (t2 within window after t1) with a
    little-term occurrence in [p1, p2]."""
    import random

    from embed_rerank_spark.operators.positions import (
        build_positional_postings,
        load_positional_index,
        span_containing_topk,
        span_within_topk,
    )

    rng = random.Random(7)
    vocab = ["ant", "bee", "cat", "dog", "elk"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 14))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = load_positional_index(build_positional_postings(docs, n_shards=4))

    def brute(t1, t2, tl, window):
        out = set()
        for doc_id, text in rows:
            toks = text.split()
            p1s = [i for i, t in enumerate(toks) if t == t1]
            p2s = [i for i, t in enumerate(toks) if t == t2]
            pls = [i for i, t in enumerate(toks) if t == tl]
            if any(
                0 < p2 - p1 <= window and any(p1 <= pl <= p2 for pl in pls)
                for p1 in p1s
                for p2 in p2s
            ):
                out.add(doc_id)
        return out

    cases = [
        ("ant", "bee", "cat", 3),
        ("cat", "cat", "dog", 2),   # same-term big span
        ("dog", "elk", "dog", 5),   # little == big edge
        ("bee", "ant", "elk", 1),
        ("elk", "dog", "bee", 4),
    ]
    for t1, t2, tl, w in cases:
        want = brute(t1, t2, tl, w)
        got = {
            r.doc_id
            for r in span_containing_topk(
                idx, [(0, t1, t2, tl)], k=100, window=w
            ).collect()
        }
        assert got == want, (t1, t2, tl, w)
        got_w = {
            r.doc_id
            for r in span_within_topk(
                idx, [(0, t1, t2, tl)], k=100, window=w
            ).collect()
        }
        assert got_w == want, ("within", t1, t2, tl, w)


def test_span_or_near_matches_python_bruteforce(spark):
    """Randomized span-or-near semantics pinned against a direct
    Python scan: any alternative occurrence within window of t2,
    distinct positions; scores cover only terms the doc contains."""
    import random

    from embed_rerank_spark.operators.positions import (
        build_positional_postings,
        load_positional_index,
        span_or_near_topk,
    )

    rng = random.Random(11)
    vocab = ["ant", "bee", "cat", "dog", "elk"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 14))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = load_positional_index(build_positional_postings(docs, n_shards=4))

    def brute(alts, t2, window):
        out = set()
        for doc_id, text in rows:
            toks = text.split()
            p1s = [i for i, t in enumerate(toks) if t in alts]
            p2s = [i for i, t in enumerate(toks) if t == t2]
            if any(
                p1 != p2 and abs(p2 - p1) <= window for p1 in p1s for p2 in p2s
            ):
                out.add(doc_id)
        return out

    cases = [
        (("ant", "bee"), "cat", 2),
        (("dog",), "dog", 1),          # self-pairing: two distinct dogs
        (("cat", "elk", "zzz"), "bee", 3),  # OOV alternative ignored
        (("zzz", "zzq"), "ant", 3),    # all-OOV -> empty
    ]
    for alts, t2, w in cases:
        want = brute(set(alts), t2, w)
        got = {
            r.doc_id
            for r in span_or_near_topk(idx, [(0, alts, t2)], k=100, window=w).collect()
        }
        assert got == want, (alts, t2, w)
