"""Query-rewrite operators: suggester, fuzzy expansion (scan and
deletion-index paths), synonym expansion."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce  # noqa: E402
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings  # noqa: E402
from embed_rerank_spark.operators.rewrite import (  # noqa: E402
    build_deletion_index,
    expand_fuzzy,
    expand_fuzzy_indexed,
    expand_synonyms,
    fuzzy_topk,
    suggest_terms,
    synonym_topk,
)

DOCS = [
    (1, "fast hash join beats sort merge join"),
    (2, "slow table scan over the table"),
    (3, "hash table lookup the fast path"),
    (4, "merge sort merge the slow path"),
    (5, "scan scan scan row row"),
    (6, "a lone row"),
]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    built = build_postings(docs, n_shards=2)
    cs = built["corpus_stats"].collect()[0]
    return InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )


def _vocab_df(index) -> dict[str, int]:
    return {r["term"]: r["df"] for r in index.term_stats.collect()}


def test_suggest_terms_order_and_cap(spark, index):
    got = suggest_terms(index, [(1, "s"), (2, "me"), (3, "zzz")], top=3)
    rows = {(r["query_id"], r["rank"]): (r["term"], r["df"]) for r in got.collect()}
    vocab = _vocab_df(index)
    expect1 = sorted(
        ((t, d) for t, d in vocab.items() if t.startswith("s")),
        key=lambda td: (-td[1], td[0]),
    )[:3]
    assert [rows[(1, r + 1)] for r in range(len(expect1))] == expect1
    assert rows[(2, 1)][0] == "merge"
    assert not any(q == 3 for q, _ in rows)


def test_expand_fuzzy_matches_python_reference(spark, index):
    vocab = _vocab_df(index)
    got = expand_fuzzy(index, ["tabl", "jion", "sow", "fast"], max_expansion=8)
    for q in ("tabl", "jion", "sow", "fast"):
        expect = sorted(
            ((t, d) for t, d in vocab.items() if _lev(t, q) <= 1),
            key=lambda td: (-td[1], td[0]),
        )
        assert got[q] == [t for t, _ in expect][:8], q
    assert "table" in got["tabl"]
    assert got["jion"] == []  # transposition is 2 edits in Levenshtein


def test_deletion_index_path_identical_to_scan(spark, index):
    didx = build_deletion_index(index)
    terms = ["tabl", "scann", "sow", "a", "b", "xyzzy", "merge"]
    assert expand_fuzzy_indexed(didx, terms) == expand_fuzzy(index, terms)


def test_fuzzy_topk_equals_bruteforce_on_expansion(spark, index):
    queries = [(1, "tabl"), (2, "sow hash"), (3, "xyzzy")]
    exp = expand_fuzzy(index, ["tabl", "sow", "hash", "xyzzy"])
    synth = []
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.split():
            for t in exp[tok]:
                if t not in terms:
                    terms.append(t)
        if terms:
            synth.append((qid, " ".join(terms)))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    brute = bm25_topk_bruteforce(spark, docs, synth, k=5)
    got = fuzzy_topk(index, queries, k=5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    g = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
         for r in sorted(got.collect(), key=key)]
    b = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
         for r in sorted(brute.collect(), key=key)]
    assert g == b
    assert not any(r[0] == 3 for r in g)  # garbage matched nothing


def test_expand_synonyms_semantics():
    groups = [["join", "merge"], ["fast", "quick"]]
    out = expand_synonyms([(1, "join table"), (2, "Quick  FAST"), (3, "")], groups)
    assert out[0] == (1, "join merge table")
    # dedupe across group members; group-canonical order, casefolded
    assert out[1] == (2, "fast quick")
    assert out[2] == (3, "")


def test_synonym_topk_equals_bruteforce_on_expansion(spark, index):
    groups = [["join", "merge"], ["scan", "row"]]
    queries = [(1, "join table"), (2, "scan")]
    expanded = expand_synonyms(queries, groups)
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    brute = bm25_topk_bruteforce(spark, docs, expanded, k=6)
    got = synonym_topk(index, queries, groups, k=6)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    g = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
         for r in sorted(got.collect(), key=key)]
    b = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
         for r in sorted(brute.collect(), key=key)]
    assert g == b


def test_spell_correct_semantics(spark, index):
    from embed_rerank_spark.operators.rewrite import spell_correct

    vocab = _vocab_df(index)
    got = {
        r["query_id"]: (r["corrected"], r["n_corrections"])
        for r in spell_correct(
            index, [(1, "tabl jon"), (2, "fast fast"), (3, "qqqqqq"), (4, "")]
        ).collect()
    }
    # OOV fixed to highest-df distance-1 term
    best_tabl = sorted(
        ((t, d) for t, d in vocab.items() if _lev(t, "tabl") <= 1),
        key=lambda td: (-td[1], td[0]),
    )[0][0]
    assert got[1] == (f"{best_tabl} join", 2)
    # in-vocab tokens untouched, duplicates preserved
    assert got[2] == ("fast fast", 0)
    # unfixable garbage passes through
    assert got[3] == ("qqqqqq", 0)
    assert got[4] == ("", 0)


def test_doc_tfidf_topn_matches_python(spark):
    import math
    from collections import Counter

    from embed_rerank_spark.operators.textstats import doc_tfidf_topn

    docs_df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r["doc_id"], r["rank"], r["term"], r["tf"], round(r["tfidf"], 6))
        for r in sorted(
            doc_tfidf_topn(docs_df, n=3).collect(),
            key=lambda r: (r["doc_id"], r["rank"]),
        )
    ]
    tfs = {d: Counter(t.lower().split()) for d, t in DOCS}
    n = len(DOCS)
    dfc: Counter = Counter()
    for c in tfs.values():
        dfc.update(c.keys())
    expect = []
    for d in sorted(tfs):
        scored = [
            (t, c, c * math.log((n - dfc[t] + 0.5) / (dfc[t] + 0.5) + 1.0))
            for t, c in tfs[d].items()
        ]
        scored.sort(key=lambda x: (-round(x[2], 6), x[0]))
        expect.extend(
            (d, i + 1, t, c, round(s, 6)) for i, (t, c, s) in enumerate(scored[:3])
        )
    assert got == expect


def test_phrase_suggest_context_beats_per_term(spark):
    """The bigram LM corrects a REAL-WORD error from context — 'jon'
    is in the vocabulary (per-term spell_correct would keep it), but
    after 'hash' the corpus overwhelmingly continues with 'join', so
    the phrase suggester rewrites the whole query; a pass-through OOV
    token with no neighbor survives verbatim."""
    from embed_rerank_spark.operators.rewrite import phrase_suggest

    docs = spark.createDataFrame(
        [
            (1, "fast hash join beats sort merge join"),
            (2, "the fast hash join wins again"),
            (3, "hash join hash join hash join"),
            (4, "jon wrote one line"),
            (5, "slow table scan"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["query_id"]: (r["suggestion"], r["score"])
        for r in phrase_suggest(
            spark,
            docs,
            [(1, "hash jon"), (2, "xyzzyplugh scan"), (3, "hash join")],
        ).collect()
    }
    assert out[1][0] == "hash join"
    assert out[2][0].endswith(" scan") and out[2][0].startswith("xyzzyplugh")
    assert out[3][0] == "hash join"
    # a correct query is its own best suggestion and outscores the typo'd one
    assert out[3][1] >= out[1][1]


def test_phrase_suggest_matches_bruteforce_lattice(spark):
    """Engine winner == exhaustive NumPy-free Python reference over
    the same candidate lattice and interpolated bigram LM."""
    import itertools
    import math
    from collections import Counter

    from embed_rerank_spark.operators.rewrite import (
        SUGGEST_FLOOR,
        SUGGEST_LAMBDA,
        phrase_suggest,
    )

    rows = DOCS
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = [(1, "tabl jon"), (2, "fast sow"), (3, "scan"), (4, "the sow the")]

    toks = {d: t.split() for d, t in rows}
    cf = Counter(w for ws in toks.values() for w in ws)
    cf2 = Counter(
        (a, b) for ws in toks.values() for a, b in zip(ws, ws[1:])
    )
    c_total = sum(cf.values())
    vocab = sorted(cf)

    def cands(t):
        near = [v for v in vocab if abs(len(v) - len(t)) <= 1 and _lev(v, t) <= 1]
        near.sort(key=lambda v: (-(v == t), -cf[v], v))
        return near[:4] if near else [t]

    def p1(w):
        return max(cf.get(w, 0) / c_total, SUGGEST_FLOOR)

    def p2(a, b):
        bg = SUGGEST_LAMBDA * cf2.get((a, b), 0) / cf[a] if cf.get(a) else 0.0
        return max(bg + (1 - SUGGEST_LAMBDA) * cf.get(b, 0) / c_total, SUGGEST_FLOOR)

    want = {}
    for qid, q in queries:
        ts = q.split()
        best = None
        for seq in itertools.product(*(cands(t) for t in ts)):
            s = round(
                math.log(p1(seq[0]))
                + sum(math.log(p2(a, b)) for a, b in zip(seq, seq[1:])),
                6,
            )
            key = (-s, " ".join(seq))
            if best is None or key < best:
                best = key
        want[qid] = (best[1], -best[0])

    got = {
        r["query_id"]: (r["suggestion"], r["score"])
        for r in phrase_suggest(spark, docs, queries).collect()
    }
    assert got == want


def test_fuzzy_auto_ladder_and_prefix_length(spark):
    from embed_rerank_spark.operators.postings import build_postings
    from embed_rerank_spark.operators.postings import InvertedIndex
    from embed_rerank_spark.operators.rewrite import auto_fuzziness, expand_fuzzy

    assert [auto_fuzziness(t) for t in ("ab", "abc", "abcde", "abcdef")] == [0, 1, 1, 2]
    docs = spark.createDataFrame(
        [(1, "customer window hash table"), (2, "customer hash scan")],
        "doc_id long, text string",
    )
    built = build_postings(docs, n_shards=2)
    cs = built["corpus_stats"].collect()[0]
    idx = InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    # AUTO: "custonr" (7 chars) gets 2 edits -> customer
    exp = expand_fuzzy(idx, ["custonr"], max_distance="AUTO")
    assert exp["custonr"] == ["customer"]
    # 2-edit budget denied at fixed distance 1
    assert expand_fuzzy(idx, ["custonr"], max_distance=1)["custonr"] == []
    # prefix_length=1: "cash"->"hash" (distance 1) dies on the first char
    assert expand_fuzzy(idx, ["cash"], max_distance=1)["cash"] == ["hash"]
    assert expand_fuzzy(idx, ["cash"], max_distance=1, prefix_length=1)["cash"] == []
    # short term: AUTO budget 0 -> exact only
    assert expand_fuzzy(idx, ["ta"], max_distance="AUTO")["ta"] == []


def test_damerau_levenshtein_matches_duckdb():
    import duckdb

    from embed_rerank_spark.operators.rewrite import damerau_levenshtein

    con = duckdb.connect()
    cases = [
        ("ab", "ba"), ("ca", "abc"), ("abcd", "acbd"), ("table", "tbale"),
        ("join", "jion"), ("scan", "scna"), ("hash", "ahsh"), ("", "abc"),
        ("same", "same"), ("kitten", "sitting"), ("query", "queyr"),
        ("a cat", "an abct"),
    ]
    for a, b in cases:
        expect = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == expect, (a, b)
        assert damerau_levenshtein(b, a) == expect, (b, a)


def test_fuzzy_transpositions_expansion(spark, index):
    # "tbale" is 1 Damerau edit (swap) but 2 plain edits from "table":
    # only the transpositions path recovers it at max_distance=1
    plain = expand_fuzzy(index, ["tbale"], max_distance=1)
    assert plain["tbale"] == []
    dl = expand_fuzzy(index, ["tbale"], max_distance=1, transpositions=True)
    assert dl["tbale"] == ["table"]
    # substitution typos still work on both paths (DL superset of Lev)
    both = expand_fuzzy(index, ["tablf"], max_distance=1, transpositions=True)
    assert both["tablf"] == ["table"]


def test_fuzzy_dl_topk_equals_bruteforce_on_expansion(spark, index):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = [(1, "tbale jion"), (2, "scna"), (3, "zzqx")]
    exp = expand_fuzzy(
        index, ["tbale", "jion", "scna", "zzqx"], max_distance=1,
        transpositions=True,
    )
    rewritten = []
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.split():
            for t in exp[tok]:
                if t not in terms:
                    terms.append(t)
        if terms:
            rewritten.append((qid, " ".join(terms)))
    brute = bm25_topk_bruteforce(spark, docs, rewritten, k=10).collect()
    got = fuzzy_topk(
        index, queries, k=10, max_distance=1, transpositions=True
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(got, key=key)
    ] == [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(brute, key=key)
    ]
    assert not any(r["query_id"] == 3 for r in got)  # garbage matches nothing


# ---- phonetic (Soundex-class) matching ----


def test_phonetic_key_col_matches_python_mirror(spark, index):
    from pyspark.sql import functions as F

    from embed_rerank_spark.operators.rewrite import (
        phonetic_key_col,
        phonetic_key_py,
    )

    terms = [r["term"] for r in index.term_stats.collect()]
    got = {
        r["term"]: r["pkey"]
        for r in index.term_stats.withColumn(
            "pkey", phonetic_key_col(F.col("term"))
        ).collect()
    }
    assert got == {t: phonetic_key_py(t) for t in terms}


def test_phonetic_key_sql_matches_python_mirror(index):
    import duckdb

    from embed_rerank_spark.operators.rewrite import (
        phonetic_key_py,
        phonetic_key_sql,
    )

    words = ["joyn", "join", "tabel", "table", "sparc", "merje", "pfister",
             "a", "x9", "999"]
    rows = ", ".join(f"('{w}')" for w in words)
    got = duckdb.sql(
        f"SELECT w, {phonetic_key_sql('w')} AS k FROM (VALUES {rows}) t(w)"
    ).fetchall()
    for w, k in got:
        want = phonetic_key_py(w)
        # '000' (empty-after-strip) is the py sentinel; SQL yields '000' too
        assert k == want, (w, k, want)


def test_phonetic_expansion_shares_key(index):
    from embed_rerank_spark.operators.rewrite import (
        expand_phonetic,
        phonetic_key_py,
    )

    exp = expand_phonetic(index, ["joyn", "tabel", "xyzzy"])
    assert "join" in exp["joyn"]
    assert "table" in exp["tabel"]
    assert exp.get("xyzzy", []) == []
    for tok, terms in exp.items():
        for t in terms:
            assert phonetic_key_py(t) == phonetic_key_py(tok)


def test_phonetic_topk_equals_bruteforce_on_expansion(spark, index):
    from embed_rerank_spark.operators.rewrite import (
        expand_phonetic,
        phonetic_topk,
    )

    queries = [(1, "joyn"), (2, "tabel merje"), (3, "xyzzy")]
    exp = expand_phonetic(index, ["joyn", "tabel", "merje", "xyzzy"])
    synth = []
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.split():
            for t in exp.get(tok, ()):
                if t not in terms:
                    terms.append(t)
        if terms:
            synth.append((qid, " ".join(terms)))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    brute = bm25_topk_bruteforce(spark, docs, synth, k=5)
    got = phonetic_topk(index, queries, k=5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    g = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
         for r in sorted(got.collect(), key=key)]
    b = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
         for r in sorted(brute.collect(), key=key)]
    assert g == b
