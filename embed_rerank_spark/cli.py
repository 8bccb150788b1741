"""spark-submit entrypoint for the engine's batch jobs.

Usage (cluster):

    spark-submit --py-files embed_rerank_spark.zip \
        -m embed_rerank_spark.cli build-index \
        --pages /data/pages --index /data/index --shards 4096

    spark-submit ... query --index /data/index \
        --queries queries.tsv --out /data/results --k 10

    spark-submit ... rerank --index /data/index --corpus /data/extracted \
        --queries queries.tsv --out /data/results --k-candidates 100 --k 10

Local smoke (this sandbox): ``python -m embed_rerank_spark.cli ...`` —
the session factory falls back to ``local[$SPARK_GRAFT_CPUS]``.

This is the engine analogue of the reference's startup lifecycle
(``app/main.py:51-160``): configuration comes from argparse/Spark conf
(reference ``app/config.py``), the index build replaces model load,
and the query/rerank jobs replace the serving endpoints.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def _int_or_auto(value: str):
    """argparse type for --shards: a positive int or the literal
    'auto' (case-insensitive) — bad input exits with a usage error
    BEFORE any Spark session starts."""
    if value.strip().lower() == "auto":
        return None
    try:
        n = int(value)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected an integer or 'auto', got {value!r}"
        ) from None
    if n <= 0:
        raise argparse.ArgumentTypeError(f"shard count must be positive, got {n}")
    return n


def _read_queries(path: str) -> list[tuple[int, str]]:
    """TSV ``query_id<TAB>query text`` (one per line)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            qid, q = line.split("\t", 1)
            out.append((int(qid), q))
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="embed-rerank-spark")
    p.add_argument("--cores", type=int, default=None, help="local[N] cores (local mode only)")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-index", help="pages table -> inverted index (resumable)")
    b.add_argument("--pages", required=True, help="parquet/Iceberg pages table path")
    b.add_argument("--index", required=True, help="output index directory")
    b.add_argument(
        "--shards", default=32, type=_int_or_auto,
        help="doc shard count, or 'auto' = max(8, cores, ceil(docs/20k)) "
        "(SPARK_GRAFT_DOCS_PER_SHARD tunes the divisor) — shard count is "
        "query-time parallelism and should scale with the corpus "
        "(BENCH/BASELINE.md r04 oversharding)",
    )
    b.add_argument("--salts", type=int, default=1,
                   help="hot-term range salts (rounded up to a power of two)")
    b.add_argument("--block-size", type=int, default=128)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--max-concurrent", type=int, default=4)
    b.add_argument(
        "--positional",
        action="store_true",
        help="encode per-posting position streams (phrase/proximity queries)",
    )

    c = sub.add_parser(
        "compact",
        help="tiered (LSM) compaction: merge same-level units, promote upward",
    )
    c.add_argument("--index", required=True)
    c.add_argument("--fanout", type=int, default=4)
    c.add_argument("--block-size", type=int, default=128)

    gcp = sub.add_parser(
        "gc", help="reclaim absorbed units older than an as-of retention horizon"
    )
    gcp.add_argument("--index", required=True)
    gcp.add_argument(
        "--retain-asof",
        required=True,
        help="keep every unit needed to answer as-of views at committed "
        "snapshots >= this id; older absorbed payloads are deleted "
        "(manifests + a GCED marker stay)",
    )

    q = sub.add_parser("query", help="BM25 top-k via block-max WAND")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True, help="TSV query_id<TAB>text")
    q.add_argument("--out", required=True, help="output parquet path")
    q.add_argument("--k", type=int, default=10)
    q.add_argument(
        "--mode",
        default="or",
        choices=[
            "or", "and", "phrase", "phrase-nextword", "boolean", "fuzzy",
            "phonetic",
            "prefix", "suffix", "infix", "regexp", "wildcard", "term-range",
            "span-not", "span-containing", "span-within", "span-or",
            "interval", "constant-score",
        ],
        help="or = disjunctive WAND; and = conjunctive leapfrog; "
        "phrase = exact phrase over a POSITIONAL index; phrase-nextword "
        "= same results over a COMBINED next-word index (build-index "
        "--combined-phrase); boolean = "
        '+must/-not/"phrase"/prefix* grammar over a POSITIONAL index; '
        "fuzzy = spell-tolerant OR (Levenshtein<=1 dictionary expansion); "
        "prefix/suffix/infix = wildcard retrieval (each query line is the "
        "term fragment; infix uses the trigram-filtered dictionary); "
        "regexp = whole-term regexp dictionary expansion; "
        "wildcard = Lucene */? whole-term patterns (prefix-pruned); "
        "term-range = lexicographic [lower, upper) dictionary range "
        "(each query line: 'lower upper'); "
        "span-not = include term NOT within --near-window of the exclude "
        "term (each query line: 'include exclude', POSITIONAL index); "
        "span-containing / span-within = ordered big span t1..t2 (gap <= "
        "--near-window) must contain the little term (each query line: "
        "'t1 t2 little', POSITIONAL index; containing scores the big "
        "pair, within scores the little term); "
        "span-or = any comma-separated alternative within --near-window "
        "of t2 (each query line: 'alt1,alt2 t2', POSITIONAL index); "
        "interval = Lucene ordered intervals with --max-gaps slack "
        "(each query line: the in-order terms, POSITIONAL index)",
    )
    q.add_argument(
        "--max-gaps",
        type=int,
        default=2,
        help="interval only: max extra tokens inside the matched span",
    )
    q.add_argument(
        "--fuzziness",
        default="1",
        help="fuzzy only: edit budget (int) or AUTO (ES ladder: "
        "0 under 3 chars, 1 for 3-5, 2 above)",
    )
    q.add_argument(
        "--prefix-length",
        type=int,
        default=0,
        help="fuzzy only: first N characters must match exactly",
    )
    q.add_argument(
        "--transpositions",
        action="store_true",
        help="fuzzy only: adjacent swaps count ONE edit "
        "(Damerau-Levenshtein — the ES fuzzy_transpositions default)",
    )
    q.add_argument(
        "--boost",
        type=float,
        default=1.0,
        help="constant-score only: the uniform score every hit gets",
    )
    q.add_argument(
        "--near-window",
        type=int,
        default=3,
        help="span-not only: exclusion slop in tokens",
    )
    q.add_argument(
        "--collapse-by",
        default=None,
        metavar="COLUMN",
        help="field-collapse results: keep the best doc per value of this "
        "doc-table column, with inner_hits group counts (needs --corpus)",
    )
    q.add_argument(
        "--corpus",
        default=None,
        help="extracted doc table (doc_id + metadata), required by --collapse-by",
    )
    q.add_argument(
        "--tiered",
        action="store_true",
        help="query the live tiered units instead of a fully merged index",
    )
    q.add_argument(
        "--min-should-match",
        type=int,
        default=1,
        help="mode=or only: docs must match >= this many distinct query "
        "terms (Lucene minimum_should_match; mm-WAND pruning)",
    )
    q.add_argument(
        "--synonyms",
        default=None,
        help="file of synonym groups (comma/space-separated terms, one "
        "group per line) applied as a query rewrite before scoring "
        "(or/fuzzy modes)",
    )
    q.add_argument(
        "--page",
        type=int,
        default=1,
        help="mode=or only: 1-based result page via keyset (search_after) "
        "pagination; --k is the page size",
    )
    q.add_argument(
        "--as-of",
        default=None,
        help="with --tiered: query the index AS OF this snapshot id "
        "(historical view from on-disk units)",
    )
    q.add_argument(
        "--analyzer",
        default="none",
        choices=["none", "stop", "stem"],
        help="apply the stop or s-stem analyzer to the query strings "
        "(must match the index's build-time --analyzer)",
    )

    sg = sub.add_parser("suggest", help="autocomplete: per-prefix top completions")
    sg.add_argument("--index", required=True)
    sg.add_argument("--prefixes", required=True, help="TSV query_id<TAB>prefix")
    sg.add_argument("--out", required=True)
    sg.add_argument("--top", type=int, default=8)

    sp = sub.add_parser(
        "spell", help="did-you-mean: correct OOV query tokens against the dictionary"
    )
    sp.add_argument("--index", required=True)
    sp.add_argument("--queries", required=True, help="TSV query_id<TAB>text")
    sp.add_argument("--out", required=True)

    fc = sub.add_parser(
        "facets",
        help="per-query facet-value counts over the FULL match set (Lucene facet semantics)",
    )
    fc.add_argument("--corpus", required=True, help="parquet with doc_id, text, facet col")
    fc.add_argument("--queries", required=True, help="TSV query_id<TAB>text")
    fc.add_argument("--out", required=True)
    fc.add_argument("--facet-col", default="lang")
    fc.add_argument("--top-n", type=int, default=None,
                    help="keep top-n facet values per query (count desc, value asc)")

    at = sub.add_parser(
        "approx-terms",
        help="sharded terms aggregation with ES doc_count_error_upper_bound",
    )
    at.add_argument("--corpus", required=True,
                    help="parquet with doc_id, text (or a keyword col)")
    at.add_argument("--out", required=True)
    at.add_argument("--bucket-col", default=None,
                    help="keyword field to bucket; omit for analyzed text")
    at.add_argument("--size", type=int, default=10)
    at.add_argument("--shard-size", type=int, default=10)
    at.add_argument("--n-shards", type=int, default=8)

    ml = sub.add_parser(
        "mlt", help="more-like-this: query-by-document over the BM25 index"
    )
    ml.add_argument("--index", required=True)
    ml.add_argument("--corpus", required=True, help="extracted table (doc_id, text)")
    ml.add_argument("--seed-ids", required=True, help="file: one seed doc_id per line")
    ml.add_argument("--out", required=True)
    ml.add_argument("--k", type=int, default=10)
    ml.add_argument("--max-terms", type=int, default=25)
    ml.add_argument("--min-tf", type=int, default=1)
    ml.add_argument("--min-df", type=int, default=1)

    pc = sub.add_parser(
        "percolate",
        help="reverse search: which registered (+must/-not/should) "
        "queries does each document match",
    )
    pc.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    pc.add_argument("--queries", required=True, help="TSV query_id<TAB>query")
    pc.add_argument("--out", required=True)

    st = sub.add_parser(
        "significant-terms",
        help="terms over-represented in each query's top hits vs the "
        "corpus (JLH score over a sampler window)",
    )
    st.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    st.add_argument("--queries", required=True, help="TSV query_id<TAB>query")
    st.add_argument("--out", required=True)
    st.add_argument("--window", type=int, default=100)
    st.add_argument("--top-n", type=int, default=10)
    st.add_argument("--min-fg-df", type=int, default=2)

    tm = sub.add_parser(
        "temperature-mix",
        help="temperature-based domain rebalancing: keep "
        "floor(budget * n_d^alpha / sum) docs per domain, md5 order",
    )
    tm.add_argument("--corpus", required=True, help="parquet doc table")
    tm.add_argument("--out", required=True)
    tm.add_argument("--alpha", type=float, default=0.5)
    tm.add_argument("--budget", type=int, required=True, help="total docs to keep")
    tm.add_argument("--domain-col", default="source")

    um = sub.add_parser(
        "unimax-mix",
        help="UniMax language-budget waterfill: small languages capped "
        "at --epochs full passes, the rest split the remaining token "
        "budget uniformly (allocation table out)",
    )
    um.add_argument("--corpus", required=True, help="parquet doc table")
    um.add_argument("--out", required=True)
    um.add_argument("--budget", type=int, required=True, help="total token budget")
    um.add_argument("--epochs", type=int, default=1, help="max epochs per language")
    um.add_argument("--lang-col", default="lang")

    pk = sub.add_parser(
        "pack",
        help="training-sequence packing: assign every doc its "
        "(seq_id, offset, n_seqs) address under contiguous fill",
    )
    pk.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    pk.add_argument("--out", required=True)
    pk.add_argument("--seq-len", type=int, required=True)

    bp = sub.add_parser(
        "build-positional-index",
        help="corpus (doc_id, text) -> positional index (phrase/proximity-capable)",
    )
    bp.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    bp.add_argument("--index", required=True)
    bp.add_argument("--shards", type=int, default=32)
    bp.add_argument("--salts", type=int, default=1)
    bp.add_argument("--block-size", type=int, default=128)
    bp.add_argument(
        "--combined-phrase",
        action="store_true",
        help="OPT-IN: also index next-word (bigram) supertokens in the "
        "same postings table — query with `query --mode phrase-nextword`. "
        "Measured on this engine's vectorized block-sliced positional "
        "kernel, the bigram path LOSES at every benched scale and the "
        "loss grows with the corpus (40k pages: 0.77x mid-term / 0.86x "
        "hot-anchor query speed at 1.6x build cost; 640k pages: 0.55x / "
        "0.68x at 2.7x build — bench.py --phrase-scaling, r04). Use only "
        "if your workload is dominated by stopword-anchored phrases AND "
        "you have verified a win on your own corpus.",
    )
    bp.add_argument(
        "--analyzer",
        default="none",
        choices=["none", "stop", "stem"],
        help="stop = drop English stopwords; stem = Harman s-stemmer "
        "(plural collapsing) — applied to the token stream before "
        "indexing (df/dl/avgdl reflect the analyzed stream); query with "
        "the MATCHING `query --analyzer`",
    )

    d = sub.add_parser(
        "delete", help="record deletion tombstones (masked now, folded in at compact)"
    )
    d.add_argument("--index", required=True)
    d.add_argument("--doc-ids", required=True, help="file: one doc_id per line")

    fs = sub.add_parser(
        "fsck", help="decode-verify every posting block + manifest reconciliation"
    )
    fs.add_argument("--index", required=True)

    iw = sub.add_parser(
        "ingest-warc", help="WARC archives -> pages table (parquet, schema-complete)"
    )
    iw.add_argument("--warc", required=True, help="path/glob of .warc files")
    iw.add_argument("--out", required=True)
    iw.add_argument(
        "--partition-by-day",
        action="store_true",
        help="write partitioned by warc_ts day (snapshot pruning)",
    )

    pr = sub.add_parser("pagerank", help="link table (src,dst) -> PageRank")
    pr.add_argument("--edges", required=True, help="parquet with src, dst")
    pr.add_argument("--out", required=True)
    pr.add_argument("--iters", type=int, default=10)
    pr.add_argument("--damping", type=float, default=0.85)

    ht = sub.add_parser(
        "hits", help="link table (src,dst) -> HITS hubs & authorities"
    )
    ht.add_argument("--edges", required=True, help="parquet with src, dst")
    ht.add_argument("--out", required=True)
    ht.add_argument("--iters", type=int, default=4)

    pf = sub.add_parser(
        "prf", help="pseudo-relevance-feedback retrieval (RM3-lite two-pass)"
    )
    pf.add_argument("--index", required=True)
    pf.add_argument("--corpus", required=True, help="extracted table (doc_id, text)")
    pf.add_argument("--queries", required=True, help="TSV query_id<TAB>text")
    pf.add_argument("--out", required=True)
    pf.add_argument("--k", type=int, default=10)
    pf.add_argument("--fb-docs", type=int, default=5, help="feedback depth (pass-1 top-k)")
    pf.add_argument("--fb-terms", type=int, default=3, help="expansion terms per query")

    dd = sub.add_parser(
        "dedup", help="corpus dedup: exact / LSH pairs / transitive clusters / dup spans"
    )
    dd.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    dd.add_argument("--out", required=True)
    dd.add_argument(
        "--method",
        default="clusters",
        choices=["exact", "pairs", "clusters", "survivors", "spans", "winnow",
                 "incremental"],
        help="exact = normalized-hash survivors; pairs = MinHash-LSH near-dup "
        "pairs; clusters = transitive clusters w/ canonical ids; survivors = "
        "pairwise survivor set; spans = exact-substring span coverage; "
        "winnow = MOSS winnowing fingerprint pairs (positional guarantee); "
        "incremental = delta-vs-base MinHash (--delta = new-crawl parquet; "
        "--corpus is the already-deduped base)",
    )
    dd.add_argument("--threshold", type=float, default=0.5, help="Jaccard cut (LSH methods)")
    dd.add_argument("--delta", help="new-crawl parquet (method=incremental)")
    dd.add_argument("--window", type=int, default=16, help="span window tokens (spans)")

    sc = sub.add_parser(
        "scrub", help="PII count + redaction (emails/ips/phones -> tokens)"
    )
    sc.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    sc.add_argument("--out", required=True)

    ud = sub.add_parser(
        "url-dedup",
        help="canonicalize crawl urls and mark one survivor per canonical group",
    )
    ud.add_argument("--pages", required=True, help="parquet with doc_id, url")
    ud.add_argument("--out", required=True)

    uf = sub.add_parser(
        "url-filter",
        help="crawl blocklist: mark pages whose host/path match rules",
    )
    uf.add_argument("--pages", required=True, help="parquet with url column")
    uf.add_argument("--out", required=True)
    uf.add_argument("--block-hosts", default="",
                    help="comma-separated host suffixes to block")
    uf.add_argument("--block-paths", default="",
                    help="comma-separated path prefixes to block")

    cd = sub.add_parser(
        "crawl-delta",
        help="snapshot diff: added/deleted/changed urls between crawls",
    )
    cd.add_argument("--old", required=True, help="old crawl parquet (url, text)")
    cd.add_argument("--new", required=True, help="new crawl parquet (url, text)")
    cd.add_argument("--out", required=True)

    hh = sub.add_parser(
        "heavy-hitters",
        help="Misra-Gries top corpus terms (bounded-memory sketch)",
    )
    hh.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    hh.add_argument("--out", required=True)
    hh.add_argument("--capacity", type=int, default=4096)
    hh.add_argument("--top-n", type=int, default=50)

    hl = sub.add_parser(
        "hll-cardinality",
        help="per-group distinct count via a mergeable HyperLogLog sketch",
    )
    hl.add_argument("--corpus", required=True, help="parquet with a group col + text")
    hl.add_argument("--out", required=True)
    hl.add_argument("--p", type=int, default=9, help="2^p registers")
    hl.add_argument("--group-col", default="lang")
    hl.add_argument("--granularity", default="shingle3",
                    choices=["term", "shingle3"])

    tl = sub.add_parser(
        "terms-lookup",
        help="ES terms-lookup query: seed-doc term set, ANY-match "
        "constant-score filter in index order",
    )
    tl.add_argument("--index", required=True)
    tl.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    tl.add_argument("--lookups", required=True,
                    help="TSV query_id<TAB>seed_doc_id")
    tl.add_argument("--out", required=True)
    tl.add_argument("--k", type=int, default=10)
    tl.add_argument("--boost", type=float, default=1.0)
    tl.add_argument("--max-terms", type=int, default=1024)

    gr = sub.add_parser(
        "geo-rings",
        help="ES geo_distance aggregation: doc counts per distance ring",
    )
    gr.add_argument("--corpus", required=True, help="parquet with doc_id")
    gr.add_argument("--out", required=True)
    gr.add_argument("--origin-lat", type=float, required=True)
    gr.add_argument("--origin-lon", type=float, required=True)
    gr.add_argument("--edges-km", required=True,
                    help="comma-separated ring boundaries, e.g. 1000,3000,8000")

    cpt = sub.add_parser(
        "change-point",
        help="CUSUM step-change detection per key over bucketed event series",
    )
    cpt.add_argument("--events", required=True,
                     help="parquet with ts, a key column, a value column")
    cpt.add_argument("--out", required=True)
    cpt.add_argument("--window", default="1 day", help="bucket width")
    cpt.add_argument("--key-col", default="event_type")
    cpt.add_argument("--value-col", default="value")

    nb = sub.add_parser(
        "nested-bool",
        help="ES bool-DSL retrieval: nested must/should/must_not/filter "
        "trees evaluated as a Catalyst join tree",
    )
    nb.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    nb.add_argument(
        "--queries",
        required=True,
        help='TSV query_id<TAB>json, e.g. {"bool": {"must": ["scan"], '
        '"should": ["hash", "sort"], "minimum_should_match": 1}}',
    )
    nb.add_argument("--out", required=True)
    nb.add_argument("--k", type=int, default=10)

    ct = sub.add_parser(
        "common-terms",
        help="Lucene CommonTermsQuery (ES cutoff_frequency): terms with "
        "df > cutoff*n_docs score but don't gate matching; the match set "
        "comes from the low-frequency terms (fallback: OR over common)",
    )
    ct.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    ct.add_argument("--queries", required=True, help="TSV query_id<TAB>text")
    ct.add_argument("--out", required=True)
    ct.add_argument("--k", type=int, default=10)
    ct.add_argument(
        "--cutoff",
        type=float,
        default=0.01,
        help="df fraction above which a term is 'common' (Lucene default-ish)",
    )

    ps = sub.add_parser(
        "phrase-suggest",
        help="whole-query did-you-mean over the corpus bigram LM "
        "(the ES phrase suggester)",
    )
    ps.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    ps.add_argument("--queries", required=True, help="TSV query_id<TAB>text")
    ps.add_argument("--out", required=True)
    ps.add_argument("--max-distance", type=int, default=1)
    ps.add_argument("--max-candidates", type=int, default=4)

    ca = sub.add_parser(
        "composite-agg",
        help="two-key composite buckets over each query's match set, "
        "paginated in composite-key order",
    )
    ca.add_argument("--corpus", required=True, help="parquet doc table")
    ca.add_argument("--queries", required=True, help="TSV query_id<TAB>text")
    ca.add_argument("--out", required=True)
    ca.add_argument("--sources", default="lang,source",
                    help="comma-separated pair of bucket key columns")
    ca.add_argument("--page-size", type=int, default=4)
    ca.add_argument("--after", default=None,
                    help="resume after this composite key: key1,key2")

    dr = sub.add_parser(
        "decay-rescore",
        help="function_score decay (gauss/exp/linear) over a retrieved "
        "candidate window, combined multiplicatively with the base score",
    )
    dr.add_argument("--candidates", required=True,
                    help="parquet with query_id, doc_id, score")
    dr.add_argument("--doc-values", required=True,
                    help="parquet with doc_id and the numeric value column")
    dr.add_argument("--out", required=True)
    dr.add_argument("--kind", default="gauss", choices=["gauss", "exp", "linear"])
    dr.add_argument("--origin", type=float, default=365.0)
    dr.add_argument("--scale", type=float, default=90.0)
    dr.add_argument("--decay", type=float, default=0.5)
    dr.add_argument("--k", type=int, default=10)
    dr.add_argument("--value-col", default="value")

    hc = sub.add_parser(
        "has-child",
        help="ES has_child: rank parents by an aggregate of their "
        "matching children's BM25 scores (child-corpus norms)",
    )
    hc.add_argument("--children", required=True,
                    help="parquet with parent_id, child_id, text")
    hc.add_argument("--queries", required=True, help="TSV query_id<TAB>text")
    hc.add_argument("--out", required=True)
    hc.add_argument("--k", type=int, default=10)
    hc.add_argument("--score-mode", default="max",
                    choices=["max", "sum", "avg", "min"])
    hc.add_argument("--min-children", type=int, default=1)
    hc.add_argument("--max-children", type=int, default=None)

    bpe = sub.add_parser(
        "bpe-train",
        help="learn a BPE merge table over the corpus "
        "(Sennrich subword units; word-frequency-table iterations)",
    )
    bpe.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    bpe.add_argument("--merges", type=int, required=True)
    bpe.add_argument("--out", required=True,
                     help="output dir: merges/ (step,a,b,cnt) + vocab/ parquet")
    bpe.add_argument("--min-pair-count", type=int, default=2)

    ds = sub.add_parser(
        "dsir-select",
        help="DSIR data selection: keep the budget docs whose hashed "
        "n-gram distribution is most like the target corpus",
    )
    ds.add_argument("--corpus", required=True, help="raw parquet with doc_id, text")
    ds.add_argument("--target", required=True, help="target parquet with doc_id, text")
    ds.add_argument("--out", required=True)
    ds.add_argument("--budget", type=int, required=True)
    ds.add_argument("--buckets", type=int, default=8192)

    be = sub.add_parser(
        "bpe-encode",
        help="encode a corpus with a trained BPE merge table "
        "(vocabulary-sized encode, per-doc token sequences)",
    )
    be.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    be.add_argument("--merges", required=True,
                    help="merges parquet from bpe-train (step,a,b[,cnt])")
    be.add_argument("--out", required=True,
                    help="output dir: docs/ (doc_id,n_tokens,tokens) + "
                    "token_counts/ (token,n_words,total)")

    qc = sub.add_parser(
        "quality-train",
        help="train the hashed-feature logistic quality filter and "
        "score every document",
    )
    qc.add_argument("--corpus", required=True, help="parquet with doc_id, text")
    qc.add_argument("--labels", required=True,
                    help="parquet with doc_id, y (0.0/1.0)")
    qc.add_argument("--out", required=True, help="scores parquet (doc_id,y,p)")
    qc.add_argument("--dim", type=int, default=64)
    qc.add_argument("--iters", type=int, default=3)
    qc.add_argument("--lr", type=float, default=0.5)

    cb = sub.add_parser(
        "ccnet-split",
        help="CCNet head/middle/tail corpus split by per-language "
        "unigram-LM cross-entropy terciles",
    )
    cb.add_argument("--corpus", required=True, help="parquet with doc_id, text, lang")
    cb.add_argument("--out", required=True, help="parquet (doc_id, lang, ce, bucket)")
    cb.add_argument("--lo", type=float, default=1.0 / 3.0)
    cb.add_argument("--hi", type=float, default=2.0 / 3.0)
    cb.add_argument(
        "--approx",
        action="store_true",
        help="t-digest percentile thresholds (no per-language sort; "
        "the web-scale path)",
    )

    rt = sub.add_parser(
        "routed-query",
        help="per-tenant BM25 over a partitionBy(routing) layout "
        "(partition pruning = the shard router)",
    )
    rt.add_argument("--docs", required=True, help="routed-layout parquet dir")
    rt.add_argument("--queries", required=True,
                    help="tsv: query_id<TAB>routing<TAB>query")
    rt.add_argument("--out", required=True)
    rt.add_argument("--routing-col", default="source")
    rt.add_argument("--k", type=int, default=10)

    iq = sub.add_parser(
        "impact-query",
        help="top-k by static score among term matches over an "
        "impact-ordered index (early termination)",
    )
    iq.add_argument("--index", required=True,
                    help="index built over impact ids")
    iq.add_argument("--dictionary", required=True,
                    help="impact_dictionary parquet (doc_id,impact_id,static)")
    iq.add_argument("--queries", required=True, help="tsv: query_id<TAB>query")
    iq.add_argument("--out", required=True)
    iq.add_argument("--k", type=int, default=10)

    kn = sub.add_parser(
        "knn",
        help="cosine top-k over an embedding parquet: exact, chunk "
        "mean/max-pooled, MaxP, or late-interaction MaxSim",
    )
    kn.add_argument("--vectors", required=True,
                    help="parquet with (id, embedding[, doc col])")
    kn.add_argument("--queries", required=True,
                    help="parquet with (query_id, qvec) — multi-row per "
                    "query_id for --mode maxsim")
    kn.add_argument("--out", required=True)
    kn.add_argument("--mode", default="exact",
                    choices=["exact", "pooled-mean", "pooled-max", "maxp",
                             "maxsim", "mmr"])
    kn.add_argument("--pool", type=int, default=20,
                    help="candidate pool size for --mode mmr")
    kn.add_argument("--lam", type=float, default=0.5,
                    help="relevance/diversity tradeoff for --mode mmr")
    kn.add_argument("--id-col", default="vec_id")
    kn.add_argument("--doc-col", default="doc_id",
                    help="chunk->doc grouping column (pooled/maxp/maxsim)")
    kn.add_argument("--k", type=int, default=10)

    r = sub.add_parser("rerank", help="retrieve + deterministic rerank")
    r.add_argument("--index", required=True)
    r.add_argument("--corpus", required=True, help="extracted table (doc_id, text)")
    r.add_argument("--queries", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--k-candidates", type=int, default=50)
    r.add_argument("--k", type=int, default=10)
    r.add_argument("--method", default="cross_encoder_lite",
                   choices=["cross_encoder_lite", "cosine", "jaccard"])

    args = p.parse_args(argv)

    if args.cmd == "dedup" and args.method == "incremental" and not args.delta:
        p.error("--delta is required for method=incremental")

    from .session import get_spark

    spark = get_spark(app_name=f"embed-rerank-{args.cmd}", cores=args.cores)
    try:
        if args.cmd == "build-index":
            from .plans.build_index import build_index

            pages = spark.read.parquet(args.pages)
            idx = build_index(
                spark,
                pages,
                args.index,
                n_shards=args.shards,
                block_size=args.block_size,
                resume=not args.no_resume,
                n_salts=args.salts,
                positional=args.positional,
            )
            print(f"index ready: {idx.n_docs} docs, avgdl={idx.avgdl:.2f}")
        elif args.cmd == "compact":
            from .plans.tiered import compact, live_units

            created = compact(
                spark, args.index, fanout=args.fanout, block_size=args.block_size
            )
            print(f"created tiers: {created or 'none'}; live units: {live_units(args.index)}")
        elif args.cmd == "gc":
            from .plans.tiered import gc_units, live_units

            gced = gc_units(args.index, retain_asof=args.retain_asof)
            print(
                f"gc'd {len(gced)} unit(s): {gced or 'none'}; "
                f"live units: {live_units(args.index)}"
            )
        elif args.cmd == "query":
            from .operators.postings import InvertedIndex

            if args.tiered:
                from .plans.tiered import load_tiered, load_tiered_as_of

                if args.as_of:
                    idx = load_tiered_as_of(spark, args.index, args.as_of)
                else:
                    idx = load_tiered(spark, args.index)
            else:
                idx = InvertedIndex.load(spark, args.index)
                from .plans.tiered import load_tombstones

                idx.tombstones = load_tombstones(args.index) or None
            queries = _read_queries(args.queries)
            if args.analyzer == "stop":
                from .functions.udfs import analyze_query_stop

                queries = analyze_query_stop(queries)
            elif args.analyzer == "stem":
                from .functions.udfs import analyze_query_s_stem

                queries = analyze_query_s_stem(queries)
            if args.synonyms:
                from .operators.rewrite import expand_synonyms

                with open(args.synonyms) as f:
                    groups = [
                        line.replace(",", " ").split()
                        for line in f
                        if line.strip()
                    ]
                queries = expand_synonyms(queries, groups)
            if args.mode == "and":
                from .operators.wand import conjunctive_topk

                out = conjunctive_topk(idx, queries, k=args.k)
            elif args.mode == "phrase":
                from .operators.positions import phrase_topk

                out = phrase_topk(idx, queries, k=args.k)
            elif args.mode == "phrase-nextword":
                from .operators.positions import phrase_topk_nextword

                out = phrase_topk_nextword(idx, None, queries, k=args.k)
            elif args.mode == "boolean":
                from .operators.boolean import boolean_topk

                out = boolean_topk(idx, queries, k=args.k)
            elif args.mode == "phonetic":
                from .operators.rewrite import phonetic_topk

                out = phonetic_topk(idx, queries, k=args.k)
            elif args.mode == "fuzzy":
                from .operators.rewrite import fuzzy_topk

                fz = args.fuzziness
                out = fuzzy_topk(
                    idx,
                    queries,
                    k=args.k,
                    max_distance=fz if fz == "AUTO" else int(fz),
                    prefix_length=args.prefix_length,
                    transpositions=args.transpositions,
                )
            elif args.mode == "prefix":
                from .operators.wand import prefix_topk

                out = prefix_topk(idx, queries, k=args.k)
            elif args.mode == "suffix":
                from .operators.wand import suffix_topk

                out = suffix_topk(idx, queries, k=args.k)
            elif args.mode == "infix":
                from .operators.wand import infix_topk

                out = infix_topk(idx, queries, k=args.k)
            elif args.mode == "regexp":
                from .operators.wand import regexp_topk

                out = regexp_topk(idx, queries, k=args.k)
            elif args.mode == "wildcard":
                from .operators.wand import wildcard_topk

                out = wildcard_topk(idx, queries, k=args.k)
            elif args.mode == "term-range":
                from .operators.wand import term_range_topk

                ranges = [
                    (qid, *q.split(None, 1)) for qid, q in queries
                    if len(q.split()) >= 2
                ]
                out = term_range_topk(idx, ranges, k=args.k)
            elif args.mode == "interval":
                from .operators.positions import interval_topk

                out = interval_topk(
                    idx,
                    [(qid, q, args.max_gaps) for qid, q in queries],
                    k=args.k,
                )
            elif args.mode == "constant-score":
                from .operators.wand import constant_score_topk

                out = constant_score_topk(
                    idx, queries, k=args.k, boost=args.boost
                )
            elif args.mode == "span-not":
                from .operators.positions import span_not_topk

                pairs = [
                    (qid, *q.split(None, 1)) for qid, q in queries
                    if len(q.split()) >= 2
                ]
                out = span_not_topk(
                    idx, pairs, k=args.k, window=args.near_window
                )
            elif args.mode in ("span-containing", "span-within"):
                from .operators.positions import (
                    span_containing_topk,
                    span_within_topk,
                )

                triples = [
                    (qid, *q.split(None, 2)) for qid, q in queries
                    if len(q.split()) >= 3
                ]
                fn = (
                    span_containing_topk
                    if args.mode == "span-containing"
                    else span_within_topk
                )
                out = fn(idx, triples, k=args.k, window=args.near_window)
            elif args.mode == "span-or":
                from .operators.positions import span_or_near_topk

                triples = [
                    (qid, tuple(parts[0].split(",")), parts[1])
                    for qid, q in queries
                    if len(parts := q.split(None, 1)) == 2
                ]
                out = span_or_near_topk(
                    idx, triples, k=args.k, window=args.near_window
                )
            elif args.page > 1:
                from .operators.wand import search_after_topk

                out = search_after_topk(
                    idx, queries, page_size=args.k, page=args.page
                )
            else:
                from .operators.wand import wand_topk

                out = wand_topk(
                    idx, queries, k=args.k, min_should_match=args.min_should_match
                )
            if args.collapse_by:
                if not args.corpus:
                    p.error("--collapse-by requires --corpus")
                from .operators.bm25 import collapse_topk

                meta = spark.read.parquet(args.corpus).select(
                    "doc_id", args.collapse_by
                )
                out = collapse_topk(
                    out.select("query_id", "doc_id", "score"),
                    meta,
                    k=args.k,
                    group_col=args.collapse_by,
                )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "suggest":
            from .operators.postings import InvertedIndex
            from .operators.rewrite import suggest_terms

            idx = InvertedIndex.load(spark, args.index)
            out = suggest_terms(idx, _read_queries(args.prefixes), top=args.top)
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "spell":
            from .operators.postings import InvertedIndex
            from .operators.rewrite import spell_correct

            idx = InvertedIndex.load(spark, args.index)
            out = spell_correct(idx, _read_queries(args.queries))
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "facets":
            from .operators.facets import facet_counts

            corpus = spark.read.parquet(args.corpus)
            out = facet_counts(
                spark,
                corpus,
                _read_queries(args.queries),
                facet_col=args.facet_col,
                top_n=args.top_n,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "approx-terms":
            from .operators.facets import approx_terms

            out = approx_terms(
                spark.read.parquet(args.corpus),
                bucket_col=args.bucket_col,
                size=args.size,
                shard_size=args.shard_size,
                n_shards=args.n_shards,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "mlt":
            from .operators.mlt import more_like_this
            from .operators.postings import InvertedIndex

            idx = InvertedIndex.load(spark, args.index)
            corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
            with open(args.seed_ids) as f:
                seeds = [int(line) for line in f if line.strip()]
            out = more_like_this(
                idx,
                corpus,
                seeds,
                k=args.k,
                max_query_terms=args.max_terms,
                min_term_freq=args.min_tf,
                min_doc_freq=args.min_df,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "percolate":
            from .operators.percolate import percolate

            corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
            out = percolate(corpus, _read_queries(args.queries))
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "significant-terms":
            from .operators.mlt import significant_terms

            corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
            out = significant_terms(
                spark,
                corpus,
                _read_queries(args.queries),
                window=args.window,
                top_n=args.top_n,
                min_fg_df=args.min_fg_df,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "temperature-mix":
            from .operators.sampling import temperature_mix

            corpus = spark.read.parquet(args.corpus)
            out = temperature_mix(
                corpus, args.alpha, args.budget, domain_col=args.domain_col
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "unimax-mix":
            from .functions.udfs import tokenize_for_scoring
            from .operators.sampling import unimax_allocation

            corpus = spark.read.parquet(args.corpus).withColumn(
                "dl", F.size(tokenize_for_scoring(F.col("text")))
            )
            out = unimax_allocation(
                corpus, args.budget, max_epochs=args.epochs, lang_col=args.lang_col
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "pack":
            from .operators.packing import pack_sequences

            corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
            out = pack_sequences(corpus, args.seq_len)
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "build-positional-index":
            from .operators.positions import (
                build_combined_phrase_index,
                build_positional_postings,
            )
            from .operators.postings import write_index

            builder = (
                build_combined_phrase_index
                if args.combined_phrase
                else build_positional_postings
            )
            corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
            if args.analyzer == "stop":
                from .functions.udfs import analyze_stop

                corpus = analyze_stop(corpus)
            elif args.analyzer == "stem":
                from .functions.udfs import analyze_s_stem

                corpus = analyze_s_stem(corpus)
            write_index(
                builder(
                    corpus,
                    n_shards=args.shards,
                    block_size=args.block_size,
                    n_salts=args.salts,
                ),
                args.index,
            )
            kind = "combined phrase" if args.combined_phrase else "positional"
            print(f"{kind} index ready: {args.index}")
        elif args.cmd == "delete":
            from .plans.tiered import delete_docs, load_tombstones

            with open(args.doc_ids) as f:
                ids = [int(line) for line in f if line.strip()]
            out_file = delete_docs(args.index, ids)
            print(
                f"recorded {len(ids)} tombstones in {out_file}; "
                f"total live tombstones: {len(load_tombstones(args.index))}"
            )
        elif args.cmd == "fsck":
            import json as _json

            from .operators.postings import InvertedIndex
            from .plans.fsck import fsck_index

            idx = InvertedIndex.load(spark, args.index)
            try:
                manifest = spark.read.parquet(f"{args.index}/manifest")
            except Exception:
                manifest = None
            report = fsck_index(idx, manifest)
            print(_json.dumps(report))
            return 0 if report["ok"] else 2
        elif args.cmd == "ingest-warc":
            from .sources.warc import pages_from_warc, read_warc

            pages = pages_from_warc(read_warc(spark, args.warc))
            if args.partition_by_day:
                pages = pages.withColumn(
                    "crawl_day", F.to_date(F.col("warc_ts"))
                )
                pages.write.mode("overwrite").partitionBy("crawl_day").parquet(
                    args.out
                )
            else:
                pages.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "pagerank":
            from .operators.graph import pagerank

            edges = spark.read.parquet(args.edges)
            out = pagerank(edges, damping=args.damping, iters=args.iters)
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "hits":
            from .operators.graph import hits

            out = hits(spark.read.parquet(args.edges), iters=args.iters)
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "prf":
            from .operators.postings import InvertedIndex
            from .operators.prf import prf_topk

            idx = InvertedIndex.load(spark, args.index)
            corpus = spark.read.parquet(args.corpus)
            out = prf_topk(
                idx,
                corpus,
                _read_queries(args.queries),
                k=args.k,
                fb_docs=args.fb_docs,
                fb_terms=args.fb_terms,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "dedup":
            from .operators import dedup as dd_ops

            corpus = spark.read.parquet(args.corpus)
            if args.method == "incremental":
                out = dd_ops.incremental_minhash_dedup(
                    spark.read.parquet(args.delta), corpus,
                    threshold=args.threshold,
                )
            elif args.method == "exact":
                out = dd_ops.exact_dedup(corpus)
            elif args.method == "pairs":
                out = dd_ops.minhash_lsh_dedup(corpus, threshold=args.threshold)
            elif args.method == "clusters":
                pairs = dd_ops.minhash_lsh_dedup(corpus, threshold=args.threshold)
                out = dd_ops.dedup_clusters(corpus, pairs)
            elif args.method == "survivors":
                pairs = dd_ops.minhash_lsh_dedup(corpus, threshold=args.threshold)
                out = dd_ops.dedup_survivors(corpus.select("doc_id"), pairs)
            elif args.method == "winnow":
                out = dd_ops.winnow_dup_pairs(corpus)
            else:
                out = dd_ops.duplicate_span_coverage(corpus, window=args.window)
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "scrub":
            from .operators.scrub import pii_scrub

            out = pii_scrub(spark.read.parquet(args.corpus))
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "url-dedup":
            from .operators.scrub import url_dedup_groups

            out = url_dedup_groups(spark.read.parquet(args.pages))
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "url-filter":
            from .operators.scrub import url_blocklist_filter

            out = url_blocklist_filter(
                spark.read.parquet(args.pages),
                host_suffixes=[h for h in args.block_hosts.split(",") if h],
                path_prefixes=[p for p in args.block_paths.split(",") if p],
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "crawl-delta":
            from .operators.scrub import crawl_delta

            out = crawl_delta(
                spark.read.parquet(args.old), spark.read.parquet(args.new)
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "heavy-hitters":
            from .operators.sketches import heavy_hitters

            out = heavy_hitters(
                spark.read.parquet(args.corpus),
                capacity=args.capacity,
                top_n=args.top_n,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "hll-cardinality":
            from .operators.sketches import hll_cardinality

            out = hll_cardinality(
                spark.read.parquet(args.corpus),
                p=args.p,
                group_col=args.group_col,
                granularity=args.granularity,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "terms-lookup":
            from .operators.postings import InvertedIndex
            from .operators.wand import terms_lookup_topk

            lookups = []
            with open(args.lookups) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        qid, seed = line.split("\t")
                        lookups.append((int(qid), int(seed)))
            out = terms_lookup_topk(
                InvertedIndex.load(spark, args.index),
                spark.read.parquet(args.corpus),
                lookups,
                k=args.k,
                boost=args.boost,
                max_terms=args.max_terms,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "geo-rings":
            from .operators.geo import geo_distance_rings, with_derived_geo

            out = geo_distance_rings(
                with_derived_geo(spark.read.parquet(args.corpus)),
                args.origin_lat,
                args.origin_lon,
                [float(e) for e in args.edges_km.split(",")],
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "change-point":
            from .operators.events import change_points

            out = change_points(
                spark.read.parquet(args.events),
                window_duration=args.window,
                key_col=args.key_col,
                value_col=args.value_col,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "nested-bool":
            import json as _json

            from .operators.boolquery import Bool, nested_bool_topk

            corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
            trees = [
                (qid, Bool.from_json(_json.loads(q)))
                for qid, q in _read_queries(args.queries)
            ]
            out = nested_bool_topk(spark, corpus, trees, k=args.k)
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "common-terms":
            from .operators.bm25 import common_terms_topk

            corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
            out = common_terms_topk(
                spark, corpus, _read_queries(args.queries), cutoff=args.cutoff, k=args.k
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "phrase-suggest":
            from .operators.rewrite import phrase_suggest

            corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
            out = phrase_suggest(
                spark,
                corpus,
                _read_queries(args.queries),
                max_distance=args.max_distance,
                max_candidates=args.max_candidates,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "composite-agg":
            from .operators.facets import composite_agg

            key1, key2 = args.sources.split(",")
            after = tuple(args.after.split(",")) if args.after else None
            out = composite_agg(
                spark,
                spark.read.parquet(args.corpus),
                _read_queries(args.queries),
                sources=(key1, key2),
                page_size=args.page_size,
                after=after,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "decay-rescore":
            from .operators.bm25 import rescore_by_decay

            out = rescore_by_decay(
                spark.read.parquet(args.candidates),
                spark.read.parquet(args.doc_values),
                kind=args.kind,
                origin=args.origin,
                scale=args.scale,
                decay=args.decay,
                k=args.k,
                value_col=args.value_col,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "has-child":
            from .operators.nesteddocs import has_child_topk

            out = has_child_topk(
                spark,
                spark.read.parquet(args.children),
                _read_queries(args.queries),
                score_mode=args.score_mode,
                k=args.k,
                min_children=args.min_children,
                max_children=args.max_children,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "bpe-train":
            from .operators.bpe import bpe_train, bpe_vocab

            corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
            merges, symtab = bpe_train(
                spark, corpus, args.merges, min_pair_count=args.min_pair_count
            )
            spark.createDataFrame(
                [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
                "step long, a string, b string, cnt long",
            ).write.mode("overwrite").parquet(f"{args.out}/merges")
            bpe_vocab(symtab).write.mode("overwrite").parquet(f"{args.out}/vocab")
            print(f"learned {len(merges)} merges -> {args.out}")
        elif args.cmd == "dsir-select":
            from .operators.dsir import dsir_select

            out = dsir_select(
                spark.read.parquet(args.corpus).select("doc_id", "text"),
                spark.read.parquet(args.target).select("doc_id", "text"),
                budget=args.budget,
                n_buckets=args.buckets,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "bpe-encode":
            from .operators.bpe import bpe_apply, bpe_token_counts

            merges_rows = (
                spark.read.parquet(args.merges).orderBy("step").collect()
            )
            merges = [(r["a"], r["b"]) for r in merges_rows]
            corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
            bpe_apply(corpus, merges).write.mode("overwrite").parquet(
                f"{args.out}/docs"
            )
            bpe_token_counts(corpus, merges).write.mode("overwrite").parquet(
                f"{args.out}/token_counts"
            )
            print(f"wrote {args.out} ({len(merges)} merges applied)")
        elif args.cmd == "ccnet-split":
            from .operators.textstats import ccnet_perplexity_buckets

            corpus = spark.read.parquet(args.corpus)
            out = ccnet_perplexity_buckets(
                corpus, lo=args.lo, hi=args.hi, exact=not args.approx
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "quality-train":
            from .operators.classifier import quality_scores

            out = quality_scores(
                spark,
                spark.read.parquet(args.corpus).select("doc_id", "text"),
                spark.read.parquet(args.labels).select("doc_id", "y"),
                dim=args.dim,
                iters=args.iters,
                lr=args.lr,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "routed-query":
            from .operators.routing import routed_topk

            routed_queries = []
            with open(args.queries) as f:
                for line in f:
                    if line.strip():
                        qid, routing, query = line.rstrip("\n").split("\t", 2)
                        routed_queries.append((int(qid), routing, query))
            out = routed_topk(
                spark,
                spark.read.parquet(args.docs),
                routed_queries,
                k=args.k,
                routing_col=args.routing_col,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "impact-query":
            from .operators.impact import impact_ordered_topk
            from .operators.postings import InvertedIndex

            idx = InvertedIndex.load(spark, args.index)
            out = impact_ordered_topk(
                idx,
                spark.read.parquet(args.dictionary),
                _read_queries(args.queries),
                k=args.k,
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "knn":
            from .operators.multivector import max_sim_topk, maxp_topk, pool_embeddings
            from .operators.similarity import cosine_topk_bruteforce

            vectors = spark.read.parquet(args.vectors)
            queries = spark.read.parquet(args.queries)
            if args.mode == "exact":
                out = cosine_topk_bruteforce(
                    vectors, queries, k=args.k, id_col=args.id_col
                )
            elif args.mode in ("pooled-mean", "pooled-max"):
                pooled = pool_embeddings(
                    vectors, group_col=args.doc_col,
                    pooling=args.mode.removeprefix("pooled-"),
                )
                out = cosine_topk_bruteforce(
                    pooled, queries, k=args.k, id_col="doc_id"
                )
            elif args.mode == "maxp":
                out = maxp_topk(vectors, queries, k=args.k, group_col=args.doc_col)
            elif args.mode == "mmr":
                from .operators.diversity import mmr_topk

                out = mmr_topk(
                    vectors, queries, k=args.k, pool=args.pool,
                    lam=args.lam, id_col=args.id_col,
                )
            else:
                out = max_sim_topk(vectors, queries, k=args.k, group_col=args.doc_col)
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        elif args.cmd == "rerank":
            from .operators.postings import InvertedIndex
            from .operators.rerank import rerank_candidates
            from .operators.wand import wand_topk

            idx = InvertedIndex.load(spark, args.index)
            queries = _read_queries(args.queries)
            cands = wand_topk(idx, queries, k=args.k_candidates)
            corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
            out = rerank_candidates(
                cands, corpus, queries, top_k=args.k, method=args.method
            )
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
