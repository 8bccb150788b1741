"""Lucene query_string surface (operators/querystring.py): grammar
pinning, documented rejections, and end-to-end parity against a pure
Python brute-force evaluator on a tiny structured corpus (the DuckDB
oracle parity at sf0.01 runs in test_entry_oracle.py)."""

from __future__ import annotations

import math

import pytest

from embed_rerank_spark.operators.querystring import (
    QBool,
    QExpanded,
    QFieldTerm,
    QFuzzy,
    QPhrase,
    QRange,
    QTerm,
    QWildcard,
    expand_leaves,
    parse_query_string,
    query_string_topk,
)

# ------------------------------------------------------------- parser


def test_and_binds_tighter_than_or():
    t = parse_query_string("a AND b OR c")
    assert isinstance(t, QBool) and len(t.should) == 2
    inner = t.should[0]
    assert isinstance(inner, QBool) and [x.text for x in inner.must] == ["a", "b"]
    assert t.should[1].text == "c"


def test_adjacency_is_lowest_precedence():
    t = parse_query_string("a b OR c")
    # seq of [a, (b OR c)]
    assert isinstance(t, QBool)
    assert t.should[0].text == "a"
    assert isinstance(t.should[1], QBool)


def test_signs_and_phrase():
    t = parse_query_string('+scan -dup "sort merge"')
    assert [x.text for x in t.must] == ["scan"]
    assert [x.text for x in t.must_not] == ["dup"]
    assert isinstance(t.should[0], QPhrase)
    assert t.msm() == 0  # shoulds are optional when a must exists


def test_or_group_msm_one():
    t = parse_query_string("hash OR merge")
    assert t.msm() == 1


def test_boost_composition():
    t = parse_query_string('("hash join"^3 OR scan)^2')
    assert t.boost == 2.0
    assert t.should[0].boost == 3.0


def test_fuzzy_wildcard_field_range_leaves():
    t = parse_query_string("tabl~1 te?m* lang:en n_chars:[1 TO 9]")
    kinds = [type(n) for n in t.should]
    assert kinds == [QFuzzy, QWildcard, QFieldTerm, QRange]
    assert t.should[0].dist == 1
    assert t.should[3].lo == 1.0 and t.should[3].hi == 9.0


def test_bare_fuzzy_tilde_is_distance_two():
    t = parse_query_string("tabl~")
    assert isinstance(t, QFuzzy) and t.dist == 2


def test_not_folds_into_and_node():
    t = parse_query_string("a AND NOT b")
    assert [x.text for x in t.must] == ["a"]
    assert [x.text for x in t.must_not] == ["b"]


def test_double_negation_cancels():
    t = parse_query_string("a AND NOT NOT b")
    assert [x.text for x in t.must] == ["a", "b"]


@pytest.mark.parametrize(
    "bad",
    [
        "a OR NOT b",  # unbounded inside OR
        "-a -b",  # purely negative
        "()",  # empty group
        "zz:[1 TO 2]",  # unknown numeric field
        "foo:bar",  # unknown keyword field
        "*",  # bare wildcard
        "lang:en*",  # wildcard in field value
        '""',  # empty phrase
        "(a",  # unbalanced parens
    ],
)
def test_documented_rejections(bad):
    with pytest.raises(ValueError):
        parse_query_string(bad)


def test_expand_leaves_cap_and_order():
    # dictionary: (term, df); fuzzy of "cat" within 1 edit
    d = [("cat", 5), ("cap", 9), ("cut", 9), ("dog", 3), ("cats", 1)]
    t = expand_leaves(parse_query_string("cat~1"), d)
    assert isinstance(t, QExpanded)
    # df desc, term asc: cap(9), cut(9), cat(5), cats(1)
    assert t.terms == ["cap", "cut", "cat", "cats"]
    w = expand_leaves(parse_query_string("ca*"), d)
    assert w.terms == ["cap", "cat", "cats"]


# ------------------------------------------------- end-to-end parity

K1, B = 1.2, 0.75

CORPUS = [
    (1, "fast hash join beats slow scan", "en", "web"),
    (2, "sort merge join on big table", "en", "web"),
    (3, "slow table scan of the table", "en", "news"),
    (4, "hash table lookup is fast fast", "fr", "web"),
    (5, "merge sort is not a join", "en", "news"),
    (6, "scan scan scan", "fr", "web"),
]


def _brute_scores():
    toks = {d: t.split() for d, t, _l, _s in CORPUS}
    n = len(toks)
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out: dict[tuple[str, int], float] = {}
    for d, ts in toks.items():
        for t in set(ts):
            tf = ts.count(t)
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            out[(t, d)] = (
                idf * tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * dl[d] / avgdl))
            )
    return out, toks


def _brute_eval(node, tscore, toks):
    """Set of (doc_id, score) matching node — mirrors the pinned
    semantics independently of both Spark and DuckDB."""
    meta = {d: {"lang": l, "source": s, "n_chars": len(t), "doc_id": d}
            for d, t, l, s in CORPUS}
    if isinstance(node, QTerm):
        return {
            d: node.boost * sc for (t, d), sc in tscore.items() if t == node.text
        }
    if isinstance(node, QExpanded):
        out: dict[int, float] = {}
        for (t, d), sc in tscore.items():
            if t in node.terms:
                out[d] = out.get(d, 0.0) + sc
        return {d: node.boost * s for d, s in out.items()}
    if isinstance(node, QPhrase):
        hits = set()
        for d, ts in toks.items():
            for i in range(len(ts) - len(node.tokens) + 1):
                if ts[i : i + len(node.tokens)] == node.tokens:
                    hits.add(d)
                    break
        uniq = set(node.tokens)
        return {
            d: node.boost
            * sum(tscore.get((t, d), 0.0) for t in uniq if (t, d) in tscore)
            for d in hits
        }
    if isinstance(node, QFieldTerm):
        return {
            d: node.boost for d, m in meta.items() if m[node.field] == node.value
        }
    if isinstance(node, QRange):
        return {
            d: node.boost
            for d, m in meta.items()
            if node.lo <= m[node.field] <= node.hi
        }
    if isinstance(node, QBool):
        musts = [_brute_eval(c, tscore, toks) for c in node.must]
        shoulds = [_brute_eval(c, tscore, toks) for c in node.should]
        nots = [_brute_eval(c, tscore, toks) for c in node.must_not]
        msm = node.msm()
        docs = None
        for m in musts:
            docs = set(m) if docs is None else docs & set(m)
        cand = docs if docs is not None else set().union(*map(set, shoulds))
        out = {}
        for d in cand:
            sn = sum(1 for s in shoulds if d in s)
            if sn < msm:
                continue
            if any(d in nx for nx in nots):
                continue
            sc = sum(m[d] for m in musts) + sum(s.get(d, 0.0) for s in shoulds)
            out[d] = node.boost * sc
        return out
    raise TypeError(node)


QUERIES = [
    (1, "fast AND table"),
    (2, "hash OR merge"),
    (3, '+scan -slow "sort merge"'),
    (4, "(fast OR slow) AND scan"),
    (5, "lang:en AND (join OR merge)"),
    (6, "n_chars:[20 TO 32] +table"),
    (7, "tabl~1"),
    (8, "sc* AND NOT slow"),
    (9, "fast^2 table"),
    (10, '"hash table"^3 OR scan'),
    (11, "source:news fast"),
]


def test_query_string_matches_python_bruteforce(spark):
    rows = [(d, t, l, s, len(t)) for d, t, l, s in CORPUS]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
        for r in query_string_topk(spark, docs, QUERIES, k=10).collect()
    }

    tscore, toks = _brute_scores()
    dictionary = [
        (t, len({d for (tt, d) in tscore if tt == t}))
        for t in {tt for tt, _ in tscore}
    ]
    want = {}
    for qid, q in QUERIES:
        tree = expand_leaves(parse_query_string(q), dictionary)
        scored = _brute_eval(tree, tscore, toks)
        ranked = sorted(scored.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))
        for rk, (d, sc) in enumerate(ranked[:10], start=1):
            want[(qid, rk)] = (d, round(sc, 6))
    assert got == want
