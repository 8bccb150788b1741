"""The engine's reference query set.

Plays the role of the reference repo's built-in judgment queries
(``tools/tests/quality-rerank-only.py:119-140`` — "capital of france",
"fastapi framework"), retargeted at the driver-provided ``documents``
corpus vocabulary. Fixed engine constants: rank-identity of BM25 and
rerank results on THIS set is the correctness gate (BASELINE.json
north_rule).

Covers: multi-term matches, a term absent from the corpus
("strategy"), the rarest corpus term ("dup"), and hot stopword-ish
terms ("the", "a") that exercise the skew path.
"""

from __future__ import annotations

QUERY_SET: list[tuple[int, str]] = [
    (1, "fast hash join"),
    (2, "sort merge join strategy"),
    (3, "slow table scan"),
    (4, "window agg query"),
    (5, "spark stream batch data"),
    (6, "dup near duplicate"),
    (7, "the a"),
    (8, "customer order line value"),
]

TOP_K = 10

# Phrase-query set for the positional index (exact consecutive-token
# match, BM25-scored over the phrase's unique terms). Shapes: common
# 2-grams, a hot-stopword 2-gram, a single-word degenerate phrase, and
# a phrase with an out-of-vocabulary term (must return zero rows).
PHRASE_SET: list[tuple[int, str]] = [
    (1, "fast table"),
    (2, "sort merge"),
    (3, "the a"),
    (4, "hash join"),
    (5, "slow scan"),
    (6, "scan"),
    (7, "zyzzyva missing"),
]


# Boolean / structured query set (operators/boolean.py grammar):
# +must  -not  "exact phrase"  prefix*  should
BOOLEAN_SET: list[tuple[int, str]] = [
    (1, '+fast +table -slow'),
    (2, '+hash "sort merge"'),
    (3, "customer order line"),
    (4, '+scan "the a" -dup'),
    (5, "+strategy fast"),  # out-of-vocabulary MUST -> empty
    (6, "s* -scan"),  # prefix clause with an exclusion
]


# Fuzzy (spell-corrected) query set: each term expands to vocabulary
# terms within Levenshtein distance 1 (df-desc, capped at
# FUZZY_MAX_EXPANSION) and the query scores as the expansion's OR.
# Shapes: single-edit typos ("tabl"->table, "hach"->hash,
# "jon"->join), a multi-match typo ("sow"->{slow,row,sort? no: sort
# is distance 2} => {slow,row}), a clean term passing through
# unchanged, and garbage matching nothing.
FUZZY_SET: list[tuple[int, str]] = [
    (1, "tabl jon"),
    (2, "hach scann"),
    (3, "sow"),
    (4, "xyzzy"),
    (5, "fast lime"),
]
FUZZY_MAX_EXPANSION = 8


def fuzzy_terms_literal() -> list[tuple[int, str]]:
    """(query_id, qterm) rows, unique lowercased terms per query —
    the pre-expansion tokenization (expansion happens corpus-side in
    both engine and oracle)."""
    out = []
    for qid, q in FUZZY_SET:
        seen = set()
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.add(tok)
                out.append((qid, tok))
    return out


def fuzzy_terms_values_sql() -> str:
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in fuzzy_terms_literal())
    return f"(VALUES {rows}) AS fq(query_id, qterm)"


# Transposition-tolerant fuzzy set (ES fuzzy_transpositions default):
# adjacent-swap typos are ONE Damerau edit but TWO plain edits, so at
# max_distance=1 these recover their source terms only on the
# transpositions path ("tbale"->table, "jion"->join, "scna"->scan,
# "queyr"->query, "ahsh"->hash); plain-substitution typos and garbage
# ride along as controls.
FUZZY_DL_SET: list[tuple[int, str]] = [
    (1, "tbale jion"),
    (2, "scna"),
    (3, "queyr fast"),
    (4, "zzqx"),
    (5, "ahsh"),
]


def fuzzy_dl_values_sql() -> str:
    out = []
    for qid, q in FUZZY_DL_SET:
        seen = set()
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.add(tok)
                out.append((qid, tok))
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in out)
    return f"(VALUES {rows}) AS fq(query_id, qterm)"


# Did-you-mean (spell correction) set: OOV tokens replaced by the
# highest-df vocabulary term within 1 edit; in-vocab tokens and
# unfixable garbage pass through; order/multiplicity preserved.
SPELL_SET: list[tuple[int, str]] = [
    (1, "tabl jon"),
    (2, "fast hach"),
    (3, "xyzzy scan"),
    (4, "the sow the"),
]


def spell_values_sql() -> str:
    """DuckDB VALUES of (query_id, pos, qterm) — position-indexed raw
    tokens (order and duplicates preserved for string reassembly)."""
    rows = ", ".join(
        f"({qid}, {pos}, '{tok}')"
        for qid, q in SPELL_SET
        for pos, tok in enumerate(q.strip().lower().split())
    )
    return f"(VALUES {rows}) AS sp(query_id, pos, qterm)"


# Search-time synonym groups (analyzer resource): members expand each
# other at query time, each keeping its own idf. Groups use real
# corpus vocabulary so expansion changes rankings; "quick" is
# deliberately out-of-vocabulary (expansion must tolerate it).
SYNONYM_GROUPS: list[list[str]] = [
    ["join", "merge"],
    ["scan", "filter"],
    ["fast", "quick"],
]

SYNONYM_SET: list[tuple[int, str]] = [
    (1, "join table"),
    (2, "scan slow"),
    (3, "fast query"),
    (4, "merge"),
]


def synonym_expanded_terms_literal() -> list[tuple[int, str]]:
    """(query_id, term) rows AFTER synonym expansion — the oracle
    embeds the expanded set (expansion is a driver-side rewrite of a
    tiny config map, so inlining it keeps the oracle pure SQL)."""
    syn: dict[str, list[str]] = {}
    for g in SYNONYM_GROUPS:
        canon = [t.strip().lower() for t in g if t.strip()]
        for t in canon:
            syn[t] = canon
    out = []
    for qid, q in SYNONYM_SET:
        seen: list[str] = []
        for tok in q.strip().lower().split():
            if not tok:
                continue
            for t in syn.get(tok, [tok]):
                if t not in seen:
                    seen.append(t)
        out.extend((qid, t) for t in seen)
    return out


def synonym_terms_values_sql() -> str:
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, t in synonym_expanded_terms_literal()
    )
    return f"(VALUES {rows}) AS qt(query_id, term)"


# Autocomplete (suggester) prefixes: top completions by df desc, term
# asc, capped at SUGGEST_TOP. A hot single letter, a full word (its
# own completion), and a no-match prefix.
SUGGEST_SET: list[tuple[int, str]] = [
    (1, "s"),
    (2, "qu"),
    (3, "join"),
    (4, "zzz"),
]
SUGGEST_TOP = 8


def suggest_values_sql() -> str:
    rows = ", ".join(f"({qid}, '{p}')" for qid, p in SUGGEST_SET)
    return f"(VALUES {rows}) AS sg(query_id, pfx)"


# Wildcard (prefix*) query set: each entry expands to the matching
# vocabulary terms (df-desc, capped) and scores as their OR query.
PREFIX_SET: list[tuple[int, str]] = [
    (1, "s"),     # scan, slow, small, sort, spark, stream, ...
    (2, "c"),     # column, customer, ...
    (3, "jo"),    # join
    (4, "zzz"),   # no matching terms -> empty
]
PREFIX_MAX_EXPANSION = 64


def prefixes_values_sql() -> str:
    rows = ", ".join(f"({qid}, '{p}')" for qid, p in PREFIX_SET)
    return f"(VALUES {rows}) AS pfx(query_id, pfx)"


# General wildcard (Lucene WildcardQuery) set: `*` = any run, `?` =
# one char, whole-term match. Shapes: literal-prefix-prunable middle
# star, single-char ?, leading wildcard (no prefix prune), bare
# prefix form, and a no-match pattern.
WILDCARD_SET: list[tuple[int, str]] = [
    (1, "s*n"),       # scan, ...
    (2, "c?stomer"),  # customer
    (3, "*ast"),      # fast (leading wildcard)
    (4, "jo*"),       # join (pure prefix form)
    (5, "q*zz?"),     # no match
]
WILDCARD_MAX_EXPANSION = 64


def wildcards_values_sql() -> str:
    """VALUES rows carrying the SQL LIKE translation of each pattern
    (`*` -> `%`, `?` -> `_`): LIKE's wildcard semantics are exactly
    Lucene's, so the oracle expands the dictionary with one LIKE."""
    rows = ", ".join(
        f"({qid}, '{p.replace('*', '%').replace('?', '_')}')"
        for qid, p in WILDCARD_SET
    )
    return f"(VALUES {rows}) AS wc(query_id, pat)"


# Proximity (NEAR/W) pair set: docs where the two terms occur within
# W tokens of each other (distinct occurrences, either order). Shapes:
# common pairs, a pair with an out-of-vocabulary term (zero rows), and
# a same-term pair (two distinct occurrences required).
PROXIMITY_SET: list[tuple[int, str, str]] = [
    (1, "fast", "table"),
    (2, "hash", "join"),
    (3, "sort", "merge"),
    (4, "the", "zyzzyva"),
    (5, "scan", "scan"),
]
PROXIMITY_WINDOW = 3


def proximity_terms_literal() -> list[tuple[int, str]]:
    out = []
    for qid, a, b in PROXIMITY_SET:
        seen = set()
        for tok in (a.strip().lower(), b.strip().lower()):
            if tok and tok not in seen:
                seen.add(tok)
                out.append((qid, tok))
    return out


def proximity_terms_values_sql() -> str:
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in proximity_terms_literal())
    return f"(VALUES {rows}) AS qt(query_id, term)"


def proximity_pairs_values_sql() -> str:
    rows = ", ".join(
        f"({qid}, '{a.strip().lower()}', '{b.strip().lower()}')"
        for qid, a, b in PROXIMITY_SET
    )
    return f"(VALUES {rows}) AS pr(query_id, t1, t2)"


def phrase_terms_literal() -> list[tuple[int, str]]:
    """(query_id, term) rows with unique lowercased terms per PHRASE —
    same tokenization contract as ``query_terms_literal``."""
    out = []
    for qid, q in PHRASE_SET:
        seen = set()
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.add(tok)
                out.append((qid, tok))
    return out


def phrase_terms_values_sql() -> str:
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in phrase_terms_literal())
    return f"(VALUES {rows}) AS qt(query_id, term)"


def phrase_needles_values_sql() -> str:
    """DuckDB VALUES of (query_id, needle) where needle is the
    single-space-joined phrase wrapped in spaces — the substring whose
    presence in the space-wrapped token join IS phrase containment."""
    rows = ", ".join(
        f"({qid}, ' {' '.join(q.strip().lower().split())} ')" for qid, q in PHRASE_SET
    )
    return f"(VALUES {rows}) AS ph(query_id, needle)"


def query_terms_literal() -> list[tuple[int, str]]:
    """(query_id, term) rows with unique lowercased terms per query —
    the exact tokenization of ``functions.udfs.tokenize_for_scoring``
    applied driver-side, used to embed the same terms into oracle SQL."""
    out = []
    for qid, q in QUERY_SET:
        seen = set()
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.add(tok)
                out.append((qid, tok))
    return out


def query_terms_values_sql() -> str:
    """DuckDB VALUES clause of (query_id, term)."""
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in query_terms_literal())
    return f"(VALUES {rows}) AS qt(query_id, term)"


def queries_values_sql() -> str:
    """DuckDB VALUES clause of (query_id, query)."""
    rows = ", ".join(f"({qid}, '{q}')" for qid, q in QUERY_SET)
    return f"(VALUES {rows}) AS q(query_id, query)"


# Boosted query set (Lucene query-time boost syntax term^w): exercises
# boost > 1, fractional boost, and a boosted stopword. Parsed by
# wand_topk(parse_boosts=True); the oracle mirrors via
# boosted_terms_values_sql().
BOOSTED_SET: list[tuple[int, str]] = [
    (1, "fast^2 hash join"),
    (2, "sort merge^0.5 join"),
    (3, "slow table^3 scan"),
    (4, "the a^2"),
]


def boosted_terms_literal() -> list[tuple[int, str, float]]:
    """(query_id, term, boost) rows — the same parse wand_topk runs
    (dedup keeps max boost, malformed suffix = literal token)."""
    out: list[tuple[int, str, float]] = []
    for qid, q in BOOSTED_SET:
        weights: dict[str, float] = {}
        order: list[str] = []
        for tok in q.strip().lower().split():
            t, w = tok, 1.0
            if "^" in tok:
                base, _, ws = tok.rpartition("^")
                try:
                    w = float(ws)
                    t = base
                except ValueError:
                    t, w = tok, 1.0
                if not t:
                    t, w = tok, 1.0
            if t in weights:
                weights[t] = max(weights[t], w)
            else:
                weights[t] = w
                order.append(t)
        out.extend((qid, t, weights[t]) for t in order)
    return out


def boosted_terms_values_sql() -> str:
    """DuckDB VALUES clause of (query_id, term, boost)."""
    rows = ", ".join(
        f"({qid}, '{t}', {w!r})" for qid, t, w in boosted_terms_literal()
    )
    return f"(VALUES {rows}) AS qt(query_id, term, boost)"


# ES `boosting` query set: (query_id, positive_query, negative_query).
# Docs are retrieved and scored by the positive query; a doc ALSO
# matching >= 1 negative term keeps its positive score multiplied by
# BOOSTING_NEGATIVE_BOOST (demoted, never excluded — the difference
# from boolean -term). Shapes: a plain demote, an out-of-vocabulary
# negative (no-op), a match-everything negative ("the"), and a
# hot-stopword positive with a rare-term negative.
BOOSTING_SET: list[tuple[int, str, str]] = [
    (1, "fast hash join", "slow scan"),
    (2, "sort merge join", "zyzzyva"),
    (3, "customer order line value", "the"),
    (4, "the a", "dup"),
]
BOOSTING_NEGATIVE_BOOST = 0.3


def _unique_terms(q: str) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for tok in q.strip().lower().split():
        if tok and tok not in seen:
            seen.add(tok)
            out.append(tok)
    return out


def boosting_pos_values_sql() -> str:
    """DuckDB VALUES clause of the positive queries' (query_id, term)."""
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, pos, _ in BOOSTING_SET for t in _unique_terms(pos)
    )
    return f"(VALUES {rows}) AS qt(query_id, term)"


def boosting_neg_values_sql() -> str:
    """DuckDB VALUES clause of the negative queries' (query_id, term)."""
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, _, neg in BOOSTING_SET for t in _unique_terms(neg)
    )
    return f"(VALUES {rows}) AS nq(query_id, term)"


# Leading-wildcard (*suffix) set: common suffixes plus one with no
# vocabulary match (empty result).
SUFFIX_SET: list[tuple[int, str]] = [
    (1, "an"),    # scan, ...
    (2, "ue"),    # value, queue-ish terms
    (3, "ow"),    # slow, window-ish, row
    (4, "qqq"),   # no match -> empty
]


def suffixes_values_sql() -> str:
    rows = ", ".join(f"({qid}, '{s}')" for qid, s in SUFFIX_SET)
    return f"(VALUES {rows}) AS sfx(query_id, sfx)"


# Double-wildcard (*infix*) set: trigram-expandable infixes, a
# no-match infix, and a sub-trigram-length infix that exercises the
# fallback dictionary scan.
INFIX_SET: list[tuple[int, str]] = [
    (1, "ash"),   # hash
    (2, "can"),   # scan
    (3, "alu"),   # value
    (4, "zzz"),   # no match -> empty
    (5, "in"),    # < 3 chars: fallback contains scan (join, window, ...)
]


def infixes_values_sql() -> str:
    rows = ", ".join(f"({qid}, '{s}')" for qid, s in INFIX_SET)
    return f"(VALUES {rows}) AS ifx(query_id, ifx)"


# AUTO-fuzziness set (ES fuzziness: AUTO + prefix_length=1): edit
# budget 0 below 3 chars, 1 for 3-5, 2 above. Shapes: a 1-edit typo +
# exact term, a 2-edit long typo, a short OOV (budget 0 -> empty), a
# typo whose only neighbor differs in char 1 (prefix_length kills
# it), and a pair of 2-edit/1-edit typos.
FUZZY_AUTO_SET: list[tuple[int, str]] = [
    (1, "tabl scan"),
    (2, "custonr"),
    (3, "ta"),
    (4, "cash join"),
    (5, "windoq aggq"),
]
FUZZY_AUTO_PREFIX_LEN = 1


def fuzzy_auto_values_sql() -> str:
    """(query_id, qterm, d) rows with the AUTO ladder applied."""
    out = []
    for qid, q in FUZZY_AUTO_SET:
        seen = set()
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.add(tok)
                n = len(tok)
                d = 0 if n < 3 else (1 if n <= 5 else 2)
                out.append((qid, tok, d))
    rows = ", ".join(f"({qid}, '{t}', {d})" for qid, t, d in out)
    return f"(VALUES {rows}) AS fq(query_id, qterm, d)"


# PMI query-segmentation set: adjacent pairs mixing collocations
# (corpus PMI >= 0.1: fast-hash, slow-table, table-scan, order-line)
# with independent pairs (~0 PMI) and an absent bigram; queries with
# no collocated pair degrade to plain BM25.
SEGMENT_SET: list[tuple[int, str]] = [
    (1, "fast hash join"),
    (2, "slow table scan"),
    (3, "customer order line"),
    (4, "sort merge join"),
    (5, "dup near"),
]
SEGMENT_MIN_PMI = 0.1
SEGMENT_MIN_COUNT = 5


def segment_pairs_values_sql() -> str:
    out = []
    for qid, q in SEGMENT_SET:
        ts = [t for t in q.strip().lower().split() if t]
        for i in range(len(ts) - 1):
            out.append((qid, ts[i], ts[i + 1]))
    rows = ", ".join(f"({qid}, '{a}', '{b}')" for qid, a, b in out)
    return f"(VALUES {rows}) AS qp(query_id, a, b)"


def segment_terms_values_sql() -> str:
    out = []
    for qid, q in SEGMENT_SET:
        seen = set()
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.add(tok)
                out.append((qid, tok))
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in out)
    return f"(VALUES {rows}) AS qt(query_id, term)"


# match_bool_prefix set (ES search-as-you-type, bool form): all terms
# but the last are BM25 shoulds; the last is a constant-score prefix
# clause. Shapes: fixed+prefix, prefix-only, a dead prefix (fixed
# terms still match), and two fixed + prefix.
MBP_BOOL_SET: list[tuple[int, str]] = [
    (1, "fast ta"),
    (2, "sort mer"),
    (3, "qu"),
    (4, "dup nea"),
    (5, "slow table sc"),
]
MBP_BOOL_MAX_EXPANSION = 8


def mbp_prefixes_values_sql() -> str:
    rows = ", ".join(
        f"({qid}, '{q.strip().lower().split()[-1]}')" for qid, q in MBP_BOOL_SET
    )
    return f"(VALUES {rows}) AS p(query_id, pfx)"


def mbp_fixed_values_sql() -> str:
    out = []
    for qid, q in MBP_BOOL_SET:
        toks = q.strip().lower().split()
        for t in dict.fromkeys(toks[:-1]):
            out.append((qid, t))
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in out)
    return f"(VALUES {rows}) AS ft(query_id, term)"


# Lucene interval query set (Intervals.maxgaps(g, ordered(terms))):
# (query_id, whitespace terms, max_gaps). Shapes: adjacency
# (max_gaps=0, the phrase degenerate), a slack pair, a 3-term chain,
# a duplicated term (strictly increasing positions required), an OOV
# term (empty result), and a wide 3-term window.
INTERVAL_SET: list[tuple[int, str, int]] = [
    (1, "fast join", 0),
    (2, "fast join", 3),
    (3, "sort merge join", 2),
    (4, "the the", 4),
    (5, "fast zyzzyva", 2),
    (6, "slow scan table", 6),
]


def interval_terms_values_sql() -> str:
    out = []
    for qid, text, _g in INTERVAL_SET:
        seen = set()
        for tok in text.strip().lower().split():
            if tok and tok not in seen:
                seen.add(tok)
                out.append((qid, tok))
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in out)
    return f"(VALUES {rows}) AS qt(query_id, term)"


def interval_matched_sql() -> str:
    """UNION ALL of one existential positions self-join per interval
    query: doc matches when an in-order strictly-increasing position
    chain exists with span slack <= max_gaps — the SQL mirror of the
    greedy searchsorted chain (greedy nearest-next is span-minimal
    per start, so the existentials agree)."""
    parts = []
    for qid, text, gaps in INTERVAL_SET:
        terms = [t for t in text.strip().lower().split() if t]
        k = len(terms)
        joins = []
        conds = [f"p1.term = '{terms[0]}'"]
        for i in range(2, k + 1):
            joins.append(
                f"JOIN posn p{i} ON p{i}.doc_id = p1.doc_id "
                f"AND p{i}.pos > p{i - 1}.pos"
            )
            conds.append(f"p{i}.term = '{terms[i - 1]}'")
        conds.append(f"p{k}.pos - p1.pos + 1 - {k} <= {gaps}")
        parts.append(
            f"SELECT {qid} AS query_id, p1.doc_id FROM posn p1 "
            + " ".join(joins)
            + " WHERE "
            + " AND ".join(conds)
            + " GROUP BY p1.doc_id"
        )
    return " UNION ALL ".join(parts)


# CommonTermsQuery set (Lucene CommonTermsQuery / ES cutoff_frequency):
# terms whose df > CUTOFF_FREQUENCY * n_docs are "common" — they score
# but cannot gate matching. On this corpus nearly every vocabulary
# term sits at df ~0.75-0.80 and "dup" at 0.05, so cutoff 0.5 splits
# cleanly. Shapes: one low term gating two common scorers; all-common
# (fallback OR over common terms); an OOV-only low side (Lucene: the
# low-freq subquery exists but hits zero docs -> empty); low terms
# mixing a real rare term with OOVs; a single low term.
COMMON_TERMS_SET: list[tuple[int, str]] = [
    (1, "dup table scan"),
    (2, "the a fast"),
    (3, "zyzzyva fast join"),
    (4, "dup near duplicate"),
    (5, "dup"),
]
CUTOFF_FREQUENCY = 0.5


def common_terms_values_sql() -> str:
    out = []
    for qid, q in COMMON_TERMS_SET:
        seen = set()
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.add(tok)
                out.append((qid, tok))
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in out)
    return f"(VALUES {rows}) AS cq(query_id, term)"


# Regexp term-query set (Lucene RegexpQuery semantics: the pattern
# must match the WHOLE term). Patterns stay inside the portable-regex
# intersection — literals, '.', classes, '*'/'+'/'?', alternation —
# so the engine (Java regex, anchored rlike) and the DuckDB oracle
# (RE2 regexp_full_match) agree. Shapes: single-char wildcard,
# alternation group, dot sandwich, optional-suffix alternation, and a
# no-match pattern (empty result).
REGEXP_SET: list[tuple[int, str]] = [
    (1, "jo.n"),            # join
    (2, "s(can|ort)"),      # scan, sort
    (3, ".a.a"),            # data
    (4, "(fast|slow)e?r?"), # fast, slow
    (5, "zz+"),             # no match -> empty
]
REGEXP_MAX_EXPANSION = 64


def regexps_values_sql() -> str:
    rows = ", ".join(f"({qid}, '{p}')" for qid, p in REGEXP_SET)
    return f"(VALUES {rows}) AS rx(query_id, pat)"


# Doc-value range filter (date-range / numeric drill-down): the
# half-open [lo, hi) window over the documents' n_chars doc value.
# Chosen to keep ~30% of the corpus in range at every sf, so the
# filter is selective but every query still fills its top-k.
DOCVALUE_LO = 120
DOCVALUE_HI = 260


# Recency rescore constants: doc "age" doc-value is derived
# deterministically as n_chars % 365 (days), decayed with a 90-day
# half-life from now=365; the first stage hands the rescorer a
# RESCORE_WINDOW-deep candidate set per query.
RESCORE_WINDOW = 50
RESCORE_NOW = 365.0
RESCORE_HALF_LIFE = 90.0


# Significant-terms aggregation (ES sampler + significant_terms, JLH
# score) over the standard QUERY_SET: foreground = each query's top
# SIG_WINDOW BM25 hits; terms must hit >= SIG_MIN_FG_DF foreground
# docs; top SIG_TOP_N per query.
SIG_WINDOW = 100
SIG_TOP_N = 10
SIG_MIN_FG_DF = 2


# Percolation (reverse search): stored queries in the term-membership
# boolean subset (+must / -not / bare should). Shapes: pure
# conjunction, must + exclusion, pure disjunction, must + shoulds, an
# out-of-vocabulary must (matches nothing), and exclusion + should.
PERCOLATE_SET: list[tuple[int, str]] = [
    (1, "+join +scan"),
    (2, "+table -slow"),
    (3, "fast slow"),
    (4, "+dup near duplicate"),
    (5, "+zyzzyva"),
    (6, "-the fast"),
]


def _parse_percolate(q: str) -> tuple[list[str], list[str], list[str]]:
    """Independent re-derivation of the percolation clause rules for
    the oracle (deliberately NOT the engine's parser): musts, then
    nots minus musts, then shoulds minus both, each sorted."""
    musts, nots, shoulds = set(), set(), set()
    for tok in q.strip().lower().split():
        if tok.startswith("+") and len(tok) > 1:
            musts.add(tok[1:])
        elif tok.startswith("-") and len(tok) > 1:
            nots.add(tok[1:])
        elif tok:
            shoulds.add(tok)
    nots -= musts
    shoulds -= musts | nots
    return sorted(musts), sorted(nots), sorted(shoulds)


def percolate_terms_values_sql() -> str:
    rows = []
    for qid, q in PERCOLATE_SET:
        musts, nots, shoulds = _parse_percolate(q)
        if not musts and not shoulds:
            continue
        rows += [f"({qid}, '{t}', 'must')" for t in musts]
        rows += [f"({qid}, '{t}', 'not')" for t in nots]
        rows += [f"({qid}, '{t}', 'should')" for t in shoulds]
    return f"(VALUES {', '.join(rows)}) AS pq(query_id, term, role)"


def percolate_consts_values_sql() -> str:
    rows = []
    for qid, q in PERCOLATE_SET:
        musts, _, shoulds = _parse_percolate(q)
        if not musts and not shoulds:
            continue
        rows.append(f"({qid}, {len(musts)}, {len(shoulds)})")
    return f"(VALUES {', '.join(rows)}) AS pc(query_id, n_must, n_should)"


# SpanFirst (term within the first SPANFIRST_LIMIT token positions —
# Lucene SpanFirstQuery): common terms with varied first positions
# plus an out-of-vocabulary term (empty result).
SPANFIRST_SET: list[tuple[int, str]] = [
    (1, "scan"),
    (2, "the"),
    (3, "join"),
    (4, "zyzzyva"),
]
SPANFIRST_LIMIT = 8


def spanfirst_values_sql() -> str:
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in SPANFIRST_SET)
    return f"(VALUES {rows}) AS sf(query_id, term)"


# match_phrase_prefix ("fixed tokens + trailing prefix*" — ES/Lucene
# MultiPhraseQuery rewrite): adjacency + dictionary expansion shapes,
# a bare-prefix degenerate, and a dead prefix (empty result).
MPP_SET: list[tuple[int, str]] = [
    (1, "fast ta*"),
    (2, "sort m*"),
    (3, "sc*"),
    (4, "hash zz*"),
    (5, "slow s*"),
]
MPP_MAX_EXPANSION = 64


def mpp_values_sql() -> str:
    rows = []
    for qid, q in MPP_SET:
        toks = q.strip().lower().split()
        fixed = " ".join(toks[:-1])
        prefix = toks[-1][:-1]
        rows.append(f"({qid}, '{fixed}', '{prefix}')")
    return f"(VALUES {', '.join(rows)}) AS mpp(query_id, fixed, prefix)"


# SpanNot query set (include term, exclude term): common include with
# common/rare/OOV excludes plus the self-exclusion degenerate (every
# occurrence blocks itself at gap 0 -> zero rows).
SPAN_NOT_SET: list[tuple[int, str, str]] = [
    (1, "fast", "table"),
    (2, "scan", "slow"),
    (3, "join", "zyzzyva"),
    (4, "scan", "scan"),
]
SPAN_NOT_WINDOW = 3


# SpanContaining / SpanWithin triple set (t1, t2, little): an ordered
# big span t1..t2 (gap <= window) must contain a little-term
# occurrence. Shapes: little == big-start (contained wherever the big
# span exists), a stopword-ish little between common pair terms, an
# OOV little (zero rows), and an OOV big edge (zero rows).
SPAN_CONTAIN_SET: list[tuple[int, str, str, str]] = [
    (1, "hash", "join", "hash"),
    (2, "sort", "merge", "sort"),
    (3, "fast", "table", "a"),
    (4, "hash", "join", "zyzzyva"),
    (5, "zyzzyva", "join", "the"),
]
SPAN_CONTAIN_WINDOW = 4


# SpanOr-inside-near set (alternatives, t2): any alternative within
# SPAN_OR_WINDOW of t2 (unordered, distinct occurrences). Shapes: two
# live alternatives, one-OOV-alternative degradation, self-pairing
# (t2 also an alternative -> needs two distinct occurrences), and
# all-OOV alternatives (zero rows).
SPAN_OR_SET: list[tuple[int, tuple[str, ...], str]] = [
    (1, ("fast", "slow"), "table"),
    (2, ("hash", "sort"), "join"),
    (3, ("zyzzyva", "scan"), "scan"),
    (4, ("zyzzyva", "zyxxo"), "table"),
]
SPAN_OR_WINDOW = 3


def span_or_alts_values_sql() -> str:
    rows = [f"({qid}, '{a}')" for qid, alts, _t2 in SPAN_OR_SET for a in alts]
    return f"(VALUES {', '.join(rows)}) AS soa(query_id, term)"


def span_or_t2_values_sql() -> str:
    rows = [f"({qid}, '{t2}')" for qid, _alts, t2 in SPAN_OR_SET]
    return f"(VALUES {', '.join(rows)}) AS sob(query_id, t2)"


def span_contain_values_sql() -> str:
    rows = ", ".join(
        f"({q}, '{a}', '{b}', '{l}')" for q, a, b, l in SPAN_CONTAIN_SET
    )
    return f"(VALUES {rows}) AS sc(query_id, t1, t2, tl)"


# Term-range (Lucene TermRangeQuery, [lower, upper) default) set:
# a mid-dictionary range, a wide range that hits the expansion cap,
# a narrow range, and an empty range.
TERM_RANGE_SET: list[tuple[int, str, str]] = [
    (1, "s", "t"),
    (2, "a", "e"),
    (3, "join", "joio"),
    (4, "zzzz", "zzzzz"),
]
TERM_RANGE_MAX_EXPANSION = 64


def term_ranges_values_sql() -> str:
    rows = ", ".join(f"({qid}, '{lo}', '{hi}')" for qid, lo, hi in TERM_RANGE_SET)
    return f"(VALUES {rows}) AS tr(query_id, lo, hi)"


# Geo surface parameters: one origin + radius for the geo_distance
# query/sort, one zoom for the geotile_grid aggregation. The synthetic
# per-doc (lon, lat) derivation lives in operators/geo.py and is
# mirrored verbatim in the oracle SQL.
GEO_ORIGIN_LAT = 20.0
GEO_ORIGIN_LON = 10.0
GEO_RADIUS_KM = 3000.0
GEO_TOP_K = 20
GEO_RING_EDGES_KM = [2000.0, 6000.0, 12000.0]
GEOTILE_ZOOM = 6


# Context-suggester request set: (id, prefix, context value) — the ES
# completion-suggester-with-contexts shape. Includes a context where
# the prefix is common, one where it's rarer, and a no-match pair.
CONTEXT_SUGGEST_SET: list[tuple[int, str, str]] = [
    (1, "s", "en"),
    (2, "ta", "de"),
    (3, "s", "fr"),
    (4, "zz", "en"),
]


def context_suggest_values_sql() -> str:
    rows = ", ".join(
        f"({qid}, '{p}', '{c}')" for qid, p, c in CONTEXT_SUGGEST_SET
    )
    return f"(VALUES {rows}) AS r(query_id, pfx, ctx)"


# C4 cleaning-rule parameters for the contract entry: the synthetic
# corpus has no newlines or punctuation, so the entry exercises the
# word-count line rule and the badword page rule (which vary per doc)
# and disables the punctuation-dependent rules; full line/sentence
# semantics are pinned by unit tests on structured fixtures.
C4_MIN_WORDS_PER_LINE = 30
C4_BADWORDS = ("spark",)

ZIPF_TOP_N = 64


# ES sparse_vector query vectors (the ELSER/SPLADE query_vector wire
# form): explicit positive (term, weight) pairs over the synthetic
# core vocabulary; q4 is fully out-of-vocabulary (zero rows).
SPARSE_VECTOR_SET: list[tuple[int, list[tuple[str, float]]]] = [
    (1, [("fast", 2.0), ("scan", 1.0), ("table", 0.25)]),
    (2, [("join", 1.5), ("merge", 1.5)]),
    (3, [("query", 3.0), ("the", 0.1)]),
    (4, [("zzqx", 1.0)]),
    (5, [("hash", 1.0), ("sort", 0.5), ("index", 0.5), ("data", 0.25)]),
]


def sparse_vector_values_sql() -> str:
    out = []
    for qid, vec in SPARSE_VECTOR_SET:
        seen: dict[str, float] = {}
        for t, w in vec:
            seen[t] = max(float(w), seen.get(t, 0.0))
        out += [(qid, t, w) for t, w in seen.items()]
    rows = ", ".join(f"({qid}, '{t}', {w})" for qid, t, w in out)
    return f"(VALUES {rows}) AS qv(query_id, term, qw)"


# Lucene query_string query set (operators/querystring.py grammar):
# exercises every pinned construct — AND/OR, signs + phrase, grouping,
# keyword-field filter, numeric range, fuzzy, wildcard + NOT, term
# boost, phrase boost under OR.
QUERY_STRING_SET: list[tuple[int, str]] = [
    (1, "fast AND table"),
    (2, "hash OR merge"),
    (3, '+scan -dup "sort merge"'),
    (4, "(fast OR slow) AND scan"),
    (5, "lang:en AND (customer OR order)"),
    (6, "n_chars:[200 TO 800] +table"),
    (7, "tabl~1 jon~1"),
    (8, "sc* AND NOT dup"),
    (9, "fast^2 table"),
    (10, '"hash join"^3 OR scan'),
]


# Sloppy-phrase (ES match_phrase + slop) set: (query_id, t1, t2, slop).
# Shapes: slop=0 exact adjacency, a transposition needing slop 2
# (Lucene's "b a" cost), mid slops, a same-term pair, and an OOV term
# (empty by AND semantics).
SLOPPY_PHRASE_SET: list[tuple[int, str, str, int]] = [
    (1, "hash", "join", 0),
    (2, "join", "hash", 2),
    (3, "sort", "merge", 1),
    (4, "table", "scan", 3),
    (5, "the", "the", 2),
    (6, "fast", "zzqx", 1),
]


def sloppy_pairs_values_sql() -> str:
    rows = ", ".join(
        f"({qid}, '{t1}', '{t2}', {slop})" for qid, t1, t2, slop in SLOPPY_PHRASE_SET
    )
    return f"(VALUES {rows}) AS sp(query_id, t1, t2, slop)"


def sloppy_terms_values_sql() -> str:
    out = []
    for qid, t1, t2, _slop in SLOPPY_PHRASE_SET:
        for t in dict.fromkeys((t1, t2)):
            out.append((qid, t))
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in out)
    return f"(VALUES {rows}) AS qt(query_id, term)"


# Phonetic (Soundex-class) query set: misspellings that SOUND like
# vocabulary terms (same first letter + collapsed code tail); xyzzy
# matches nothing.
PHONETIC_SET: list[tuple[int, str]] = [
    (1, "joyn"),
    (2, "tabel merje"),
    (3, "sparc fillter"),
    (4, "xyzzy"),
]


def phonetic_terms_values_sql() -> str:
    out = []
    for qid, q in PHONETIC_SET:
        seen = set()
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.add(tok)
                out.append((qid, tok))
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in out)
    return f"(VALUES {rows}) AS fq(query_id, qterm)"
