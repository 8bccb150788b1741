"""Lucene ``query_string`` surface — one grammar composing the
engine's retrieval primitives (terms, phrases, fuzzy, wildcards,
metadata fields/ranges, boosts, AND/OR/NOT, +/-, parentheses) into a
single boolean tree, evaluated DECLARATIVELY as a Catalyst join tree
over shared per-(term, doc) BM25 scores — the same relational-algebra
form as ``operators/boolquery.py`` (every leaf a filtered slice, every
must an inner join, every should group a union+aggregate, every
must_not an anti-join), so AQE picks broadcast vs shuffle per branch
from runtime sizes and nothing collects corpus-sized data.

Grammar (PINNED — a clean precedence grammar, deliberately NOT the
classic Lucene QueryParser's flat-and-quirky operator handling;
deviations documented inline):

    query   := seq                         # whitespace = lowest prec
    seq     := signed+                     # 2+ items -> one bool node
    signed  := ('+' | '-' | NOT)? orExpr
    orExpr  := andExpr (OR andExpr)*       # NOT > AND > OR > adjacency
    andExpr := unary (AND unary)*
    unary   := NOT unary | primary
    primary := '(' query ')' boost?
             | '"' words '"' boost?        # exact consecutive phrase
             | field ':' '[' lit TO lit ']' boost?   # numeric range
             | field ':' value boost?      # keyword equality
             | word boost?                 # term; trailing ~N = fuzzy;
                                           # '*' / '?' chars = wildcard
    boost   := '^' number                  # must be >= 0

Pinned semantics (mirrored bit-for-bit by the generated DuckDB oracle
from :func:`oracle_query_sql`):

- seq: '+' items are MUST, '-'/NOT items MUST_NOT, bare items SHOULD;
  minimum_should_match = 1 when the node has shoulds but no musts,
  else 0 (the ES bool default). A sign applies to the whole OR/AND
  group it prefixes.
- ``a OR b`` = bool(should=[a, b], msm=1); NOT inside OR is rejected
  (an unbounded match-all-minus clause). ``a AND b`` = bool(must);
  ``a AND NOT b`` folds the negation into the same node's must_not.
- term leaf score = boost x Okapi BM25 term score (corpus-wide
  stats, k1/b engine constants).
- phrase leaf: doc matches iff the tokens occur consecutively;
  score = boost x sum of the phrase's DISTINCT member-term BM25
  scores (the flat ``operators/boolean.py`` scoring rule).
- fuzzy leaf ``w~d`` (d in {1, 2}): expands to vocabulary terms
  within Levenshtein distance d (df desc, term asc, capped at
  ``QS_MAX_EXPANSION``); doc matches iff ANY expansion present;
  score = boost x sum of present expansion-term BM25 scores
  (SynonymQuery-style: each expansion keeps its own idf).
- wildcard leaf (``*`` = any run, ``?`` = one char): same expansion
  semantics with the pattern match instead of the edit distance.
- field leaf ``lang:en`` (keyword fields) and range leaf
  ``n_chars:[200 TO 800]`` (numeric fields, inclusive): CONSTANT
  score = boost (Lucene's constant-score rewrite for filters; a
  deviation from scoring keyword TermQueries, pinned for sanity).
- bool node score = sum of matching must scores + matching should
  scores (filter-style leaves contribute their constant), then
  x node boost; ranking = engine tie semantics (rounded score desc,
  doc_id asc).

Scale shape (100 TB): the scored-term base is the brute scorer's two
combinable hash aggs; each literal leaf is a single-term slice of it
(a posting list — broadcastable); fuzzy/wildcard expansion scans only
the term DICTIONARY (vocabulary-sized, not corpus-sized) and collects
a capped planning-sized list; phrase adjacency joins are
(doc_id, pos)-keyed equijoins over position rows of the phrase's own
terms only; metadata leaves are pushdown-able parquet filters. Tree
size bounds plan size, not data size.

Reference analogue: none in joonsoome/embed-rerank (serving repo, no
query language) — this is the Lucene/ES ``query_string`` surface
(lucene QueryParser.jj; ES query-string-query docs) rebuilt
Spark-first.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from .bm25 import TIE_DECIMALS, term_freqs_dl
from ..functions.udfs import tokenize_for_scoring
from .boolquery import _scored_terms

QS_MAX_EXPANSION = 8

# fields the documents table exposes to field / range syntax
KEYWORD_FIELDS = ("lang", "source")
NUMERIC_FIELDS = ("n_chars", "doc_id")


# ---------------------------------------------------------------- AST


@dataclass
class QTerm:
    text: str
    boost: float = 1.0


@dataclass
class QPhrase:
    tokens: list[str]
    boost: float = 1.0


@dataclass
class QFuzzy:
    text: str
    dist: int
    boost: float = 1.0


@dataclass
class QWildcard:
    pattern: str
    boost: float = 1.0


@dataclass
class QFieldTerm:
    field: str
    value: str
    boost: float = 1.0


@dataclass
class QRange:
    field: str
    lo: float
    hi: float
    boost: float = 1.0


@dataclass
class QExpanded:
    """Post-planning form of fuzzy/wildcard: OR over literal terms."""

    terms: list[str]
    boost: float = 1.0


@dataclass
class QBool:
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    boost: float = 1.0

    def msm(self) -> int:
        return 1 if self.should and not self.must else 0


# ------------------------------------------------------------- parser

_TOKEN_RE = re.compile(
    r"""\s+
      | (?P<lparen>\() | (?P<rparen>\))
      | (?P<phrase>"[^"]*")
      | (?P<range>\w+:\[[^\]]*\])
      | (?P<sign>[+-])(?=[^\s)])
      | (?P<boost>\^[0-9]+(?:\.[0-9]+)?)
      | (?P<word>[^\s()^"]+)
    """,
    re.X,
)


def _tokenize(q: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    i = 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if m is None:
            raise ValueError(f"query_string: cannot tokenize at {q[i:]!r}")
        i = m.end()
        for kind in ("lparen", "rparen", "phrase", "range", "sign", "boost", "word"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    return toks


_RANGE_RE = re.compile(r"^(\w+):\[([^\s\]]+)\s+TO\s+([^\s\]]+)\]$")
_FUZZY_RE = re.compile(r"^(.+)~([12])$")


class _Parser:
    """Recursive descent over the token list; see module grammar."""

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse_query(self):
        node = self.parse_seq()
        if self.peek()[0] is not None:
            raise ValueError(f"query_string: trailing {self.peek()[1]!r}")
        return node

    def parse_seq(self):
        items: list[tuple[str, object]] = []  # (occur, node)
        while True:
            kind, val = self.peek()
            if kind is None or kind == "rparen":
                break
            occur = "should"
            if kind == "sign":
                self.next()
                occur = "must" if val == "+" else "must_not"
            elif kind == "word" and val == "NOT":
                self.next()
                occur = "must_not"
            items.append((occur, self.parse_or()))
        if not items:
            raise ValueError("query_string: empty query/group")
        if len(items) == 1 and items[0][0] == "should":
            return items[0][1]
        node = QBool()
        for occur, n in items:
            getattr(node, occur).append(n)
        if not node.must and not node.should:
            raise ValueError(
                "query_string: purely negative queries are unbounded"
            )
        return node

    def parse_or(self):
        parts = [self.parse_and()]
        while self.peek() == ("word", "OR"):
            self.next()
            parts.append(self.parse_and())
        if len(parts) == 1:
            return parts[0]
        for p in parts:
            if isinstance(p, tuple):
                raise ValueError("query_string: NOT inside OR is unbounded")
        return QBool(should=parts)

    def parse_and(self):
        parts = [self.parse_unary()]
        while self.peek() == ("word", "AND"):
            self.next()
            parts.append(self.parse_unary())
        if len(parts) == 1:
            p = parts[0]
            if isinstance(p, tuple):  # lone NOT x outside a seq/AND
                raise ValueError(
                    "query_string: NOT needs a positive sibling clause"
                )
            return p
        must = [p for p in parts if not isinstance(p, tuple)]
        must_not = [p[1] for p in parts if isinstance(p, tuple)]
        if not must:
            raise ValueError("query_string: AND of only-negated clauses")
        return QBool(must=must, must_not=must_not)

    def parse_unary(self):
        if self.peek() == ("word", "NOT"):
            self.next()
            inner = self.parse_unary()
            if isinstance(inner, tuple):
                return inner[1]  # double negation cancels
            return ("not", inner)
        return self.parse_primary()

    def _boost(self, node):
        kind, val = self.peek()
        if kind == "boost":
            self.next()
            w = float(val[1:])
            node.boost = node.boost * w
        return node

    def parse_primary(self):
        kind, val = self.next()
        if kind == "lparen":
            node = self.parse_seq()
            k2, _v2 = self.next()
            if k2 != "rparen":
                raise ValueError("query_string: unbalanced parentheses")
            return self._boost(node)
        if kind == "phrase":
            toks = [t for t in val[1:-1].lower().split() if t]
            if not toks:
                raise ValueError("query_string: empty phrase")
            return self._boost(QPhrase(tokens=toks))
        if kind == "range":
            rm = _RANGE_RE.match(val)
            if rm is None:
                raise ValueError(f"query_string: malformed range {val!r}")
            fld, lo, hi = rm.group(1).lower(), rm.group(2), rm.group(3)
            if fld not in NUMERIC_FIELDS:
                raise ValueError(f"query_string: non-numeric range field {fld!r}")
            return self._boost(QRange(field=fld, lo=float(lo), hi=float(hi)))
        if kind != "word":
            raise ValueError(f"query_string: unexpected {val!r}")
        if ":" in val:
            fld, _, v = val.partition(":")
            fld = fld.lower()
            if fld not in KEYWORD_FIELDS:
                raise ValueError(f"query_string: unknown field {fld!r}")
            if not v or "~" in v or "*" in v or "?" in v:
                raise ValueError(
                    f"query_string: field value {v!r} must be a plain keyword"
                )
            return self._boost(QFieldTerm(field=fld, value=v.lower()))
        fm = _FUZZY_RE.match(val)
        if fm:
            base = fm.group(1).lower()
            if "*" in base or "?" in base:
                raise ValueError("query_string: fuzzy wildcard is unsupported")
            return self._boost(QFuzzy(text=base, dist=int(fm.group(2))))
        if val.endswith("~"):
            return self._boost(QFuzzy(text=val[:-1].lower(), dist=2))
        if "*" in val or "?" in val:
            if set(val) <= {"*", "?"}:
                raise ValueError("query_string: bare-wildcard term")
            return self._boost(QWildcard(pattern=val.lower()))
        return self._boost(QTerm(text=val.lower()))


def parse_query_string(q: str):
    """Parse ``q`` into the pinned AST; raises ValueError on the
    documented rejections (empty groups, NOT-in-OR, pure negation,
    unknown fields, bare wildcards)."""
    return _Parser(_tokenize(q.strip())).parse_query()


# ----------------------------------------------------------- planning


def _collect(node, pred) -> list:
    out = []

    def walk(n):
        if pred(n):
            out.append(n)
        if isinstance(n, QBool):
            for c in n.must + n.should + n.must_not:
                walk(c)

    walk(node)
    return out


def expand_leaves(node, dictionary: list[tuple[str, int]]):
    """Replace QFuzzy/QWildcard leaves with QExpanded in place.

    ``dictionary`` is the (term, df) vocabulary; expansion picks
    matches ordered df desc / term asc, capped at QS_MAX_EXPANSION —
    the FuzzyQuery rewrite bound, identical to the oracle's window."""

    def levenshtein(a: str, b: str) -> int:
        if abs(len(a) - len(b)) > 2:
            return 3
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def pick(matches):
        ordered = sorted(matches, key=lambda td: (-td[1], td[0]))
        return [t for t, _df in ordered[:QS_MAX_EXPANSION]]

    def rewrite(n):
        if isinstance(n, QFuzzy):
            return QExpanded(
                terms=pick(
                    [
                        (t, d)
                        for t, d in dictionary
                        if levenshtein(t, n.text) <= n.dist
                    ]
                ),
                boost=n.boost,
            )
        if isinstance(n, QWildcard):
            rx = re.compile(
                "^"
                + "".join(
                    ".*" if c == "*" else "." if c == "?" else re.escape(c)
                    for c in n.pattern
                )
                + "$"
            )
            return QExpanded(
                terms=pick([(t, d) for t, d in dictionary if rx.match(t)]),
                boost=n.boost,
            )
        if isinstance(n, QBool):
            n.must = [rewrite(c) for c in n.must]
            n.should = [rewrite(c) for c in n.should]
            n.must_not = [rewrite(c) for c in n.must_not]
        return n

    return rewrite(node)


def scoring_terms(node) -> set[str]:
    """Every literal term any leaf can touch (for base prefiltering)."""
    out: set[str] = set()
    for n in _collect(node, lambda x: True):
        if isinstance(n, QTerm):
            out.add(n.text)
        elif isinstance(n, QPhrase):
            out.update(n.tokens)
        elif isinstance(n, QExpanded):
            out.update(n.terms)
    return out


def _needs_dictionary(node) -> bool:
    return bool(_collect(node, lambda n: isinstance(n, (QFuzzy, QWildcard))))


def _needs_positions(node) -> bool:
    return bool(
        _collect(node, lambda n: isinstance(n, QPhrase) and len(n.tokens) > 1)
    )


# --------------------------------------------------------------- eval


def _eval(node, tscore: DataFrame, posn: DataFrame | None, docs: DataFrame):
    """(doc_id, score) for ``node`` under the pinned semantics."""
    if isinstance(node, QTerm):
        out = tscore.filter(F.col("term") == node.text).select(
            "doc_id", (F.col("score") * F.lit(node.boost)).alias("score")
        )
        return out
    if isinstance(node, QExpanded):
        if not node.terms:
            return (
                tscore.filter(F.lit(False)).select("doc_id", "score")
            )
        return (
            tscore.filter(F.col("term").isin(node.terms))
            .groupBy("doc_id")
            .agg((F.sum("score") * F.lit(node.boost)).alias("score"))
        )
    if isinstance(node, QPhrase):
        toks = node.tokens
        distinct = sorted(set(toks))
        if len(toks) == 1:
            m = tscore.filter(F.col("term") == toks[0]).select("doc_id")
        else:
            assert posn is not None
            m = posn.filter(F.col("term") == toks[0]).select("doc_id", "pos")
            for i, t in enumerate(toks[1:], start=1):
                nxt = posn.filter(F.col("term") == t).select(
                    "doc_id", (F.col("pos") - i).alias("pos")
                )
                m = m.join(nxt, ["doc_id", "pos"])
            m = m.select("doc_id")
        m = m.distinct()
        sc = (
            tscore.filter(F.col("term").isin(distinct))
            .groupBy("doc_id")
            .agg(F.sum("score").alias("_ps"))
        )
        return m.join(sc, "doc_id").select(
            "doc_id", (F.col("_ps") * F.lit(node.boost)).alias("score")
        )
    if isinstance(node, QFieldTerm):
        return (
            docs.filter(F.col(node.field) == node.value)
            .select("doc_id")
            .withColumn("score", F.lit(float(node.boost)))
        )
    if isinstance(node, QRange):
        return (
            docs.filter(
                (F.col(node.field) >= node.lo) & (F.col(node.field) <= node.hi)
            )
            .select("doc_id")
            .withColumn("score", F.lit(float(node.boost)))
        )
    if isinstance(node, QBool):
        parts_must = [_eval(c, tscore, posn, docs) for c in node.must]
        parts_should = [_eval(c, tscore, posn, docs) for c in node.should]
        parts_not = [_eval(c, tscore, posn, docs) for c in node.must_not]
        msm = node.msm()
        cur: DataFrame | None = None
        for p in parts_must:
            p = p.withColumnRenamed("score", "_s")
            cur = (
                p.select("doc_id", F.col("_s").alias("score"))
                if cur is None
                else cur.join(p, "doc_id").select(
                    "doc_id", (F.col("score") + F.col("_s")).alias("score")
                )
            )
        if parts_should:
            sh = (
                reduce(DataFrame.unionByName, parts_should)
                .groupBy("doc_id")
                .agg(F.sum("score").alias("_ss"), F.count(F.lit(1)).alias("_sn"))
            )
            if cur is None:
                cur = sh.filter(F.col("_sn") >= max(msm, 1)).select(
                    "doc_id", F.col("_ss").alias("score")
                )
            else:
                cur = (
                    cur.join(sh, "doc_id", "left")
                    .filter(F.coalesce(F.col("_sn"), F.lit(0)) >= msm)
                    .select(
                        "doc_id",
                        (
                            F.col("score") + F.coalesce(F.col("_ss"), F.lit(0.0))
                        ).alias("score"),
                    )
                )
        if cur is None:
            raise ValueError("query_string: bool node without positive clause")
        for p in parts_not:
            cur = cur.join(p.select("doc_id").distinct(), "doc_id", "left_anti")
        if node.boost != 1.0:
            cur = cur.select(
                "doc_id", (F.col("score") * F.lit(node.boost)).alias("score")
            )
        return cur
    raise TypeError(f"query_string: unknown node {node!r}")


def query_string_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score): top-k per query_string query.

    One shared scored-term base (prefiltered to the union of every
    query's literal terms after expansion) feeds all trees; a position
    table is built only when some query has a multi-token phrase; the
    docs table serves metadata leaves directly (its filters push down
    to the scan). Fuzzy/wildcard expansion collects only the matching
    slice of the term DICTIONARY (vocabulary-sized), capped per leaf.
    """
    trees = [(qid, parse_query_string(q)) for qid, q in queries]

    if any(_needs_dictionary(t) for _, t in trees):
        tfdl = term_freqs_dl(docs, id_col, text_col)
        dictionary = [
            (r["term"], r["df"])
            for r in tfdl.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .collect()
        ]
        trees = [(qid, expand_leaves(t, dictionary)) for qid, t in trees]

    all_terms = sorted(set().union(*(scoring_terms(t) for _, t in trees)))
    base = _scored_terms(docs, id_col, text_col, k1, b)
    if all_terms:
        base = base.filter(F.col("term").isin(all_terms))

    posn = None
    if any(_needs_positions(t) for _, t in trees):
        ph_terms = sorted(
            {
                tok
                for _, t in trees
                for p in _collect(t, lambda n: isinstance(n, QPhrase))
                for tok in p.tokens
            }
        )
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            tokenize_for_scoring(F.col(text_col)).alias("toks"),
        )
        posn = toks.select(
            "doc_id", F.posexplode("toks").alias("pos", "term")
        ).filter(F.col("term").isin(ph_terms))

    meta = docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in (*KEYWORD_FIELDS, *NUMERIC_FIELDS) if c in docs.columns and c != id_col],
    )

    per_q = [
        _eval(tree, base, posn, meta).select(
            F.lit(qid).cast("long").alias("query_id"), "doc_id", "score"
        )
        for qid, tree in trees
    ]
    scored = reduce(DataFrame.unionByName, per_q)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), TIE_DECIMALS)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


# ----------------------------------------------------- oracle (DuckDB)


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _like_pattern(p: str) -> str:
    out = []
    for c in p:
        if c == "*":
            out.append("%")
        elif c == "?":
            out.append("_")
        elif c in ("%", "_", "\\"):
            out.append("\\" + c)
        else:
            out.append(c)
    return "".join(out)


def oracle_node_sql(node) -> str:
    """DuckDB subquery ``(SELECT doc_id, score ...)`` mirroring the
    pinned semantics over the shared CTEs ``tscore`` (term, doc_id,
    score), ``posn`` (doc_id, term, pos), ``df`` (term, df) and the
    ``documents`` view. Fuzzy/wildcard expansion is RECOMPUTED in SQL
    (levenshtein / LIKE over df, same df-desc/term-asc window, same
    cap) rather than inlined from the Spark plan — the oracle stays
    independent of the engine's planning code."""
    if isinstance(node, QTerm):
        return (
            f"(SELECT doc_id, {node.boost!r} * score AS score "
            f"FROM tscore WHERE term = {_sql_lit(node.text)})"
        )
    if isinstance(node, (QFuzzy, QWildcard)):
        if isinstance(node, QFuzzy):
            match = f"levenshtein(df.term, {_sql_lit(node.text)}) <= {node.dist}"
        else:
            match = (
                f"df.term LIKE {_sql_lit(_like_pattern(node.pattern))} "
                "ESCAPE '\\'"
            )
        return (
            f"(SELECT t.doc_id, {node.boost!r} * sum(t.score) AS score "
            "FROM tscore t WHERE t.term IN (SELECT term FROM ("
            "SELECT df.term, row_number() OVER (ORDER BY df.df DESC, "
            f"df.term ASC) AS rk FROM df WHERE {match}) "
            f"WHERE rk <= {QS_MAX_EXPANSION}) GROUP BY t.doc_id)"
        )
    if isinstance(node, QPhrase):
        toks = node.tokens
        distinct = sorted(set(toks))
        in_list = ", ".join(_sql_lit(t) for t in distinct)
        if len(toks) == 1:
            m = (
                f"(SELECT DISTINCT doc_id FROM tscore "
                f"WHERE term = {_sql_lit(toks[0])})"
            )
        else:
            joins = "".join(
                f"\n    JOIN posn p{i} ON p{i}.doc_id = p0.doc_id "
                f"AND p{i}.term = {_sql_lit(t)} AND p{i}.pos = p0.pos + {i}"
                for i, t in enumerate(toks[1:], start=1)
            )
            m = (
                "(SELECT DISTINCT p0.doc_id FROM posn p0"
                + joins
                + f"\n    WHERE p0.term = {_sql_lit(toks[0])})"
            )
        return (
            f"(SELECT m.doc_id, {node.boost!r} * s.ps AS score FROM {m} m "
            f"JOIN (SELECT doc_id, sum(score) AS ps FROM tscore "
            f"WHERE term IN ({in_list}) GROUP BY doc_id) s "
            "ON s.doc_id = m.doc_id)"
        )
    if isinstance(node, QFieldTerm):
        return (
            f"(SELECT doc_id, CAST({node.boost!r} AS DOUBLE) AS score "
            f"FROM documents WHERE {node.field} = {_sql_lit(node.value)})"
        )
    if isinstance(node, QRange):
        return (
            f"(SELECT doc_id, CAST({node.boost!r} AS DOUBLE) AS score "
            f"FROM documents WHERE {node.field} >= {node.lo!r} "
            f"AND {node.field} <= {node.hi!r})"
        )
    if isinstance(node, QBool):
        musts = [oracle_node_sql(c) for c in node.must]
        shs = [oracle_node_sql(c) for c in node.should]
        nots = [oracle_node_sql(c) for c in node.must_not]
        msm = node.msm()
        froms: list[str] = []
        score_terms: list[str] = []
        for i, s in enumerate(musts):
            froms.append(f"{s} m{i}")
            score_terms.append(f"m{i}.score")
        sh_join = ""
        where: list[str] = []
        if shs:
            union = "\n    UNION ALL\n    ".join(
                f"SELECT * FROM {s} u{i}" for i, s in enumerate(shs)
            )
            sh_sub = (
                "(SELECT doc_id, sum(score) AS ss, count(*) AS sn FROM (\n    "
                + union
                + "\n  ) GROUP BY doc_id)"
            )
            if froms:
                sh_join = f"LEFT JOIN {sh_sub} sh USING (doc_id)"
                where.append(f"coalesce(sh.sn, 0) >= {msm}")
                score_terms.append("coalesce(sh.ss, 0)")
            else:
                froms.append(f"{sh_sub} sh")
                where.append(f"sh.sn >= {max(msm, 1)}")
                score_terms.append("sh.ss")
        if not froms:
            raise ValueError("query_string: bool node without positive clause")
        score_expr = " + ".join(score_terms) if score_terms else "0.0"
        if node.boost != 1.0:
            score_expr = f"{node.boost!r} * ({score_expr})"
        from_chain = froms[0] + "".join(
            f"\n  JOIN {f} USING (doc_id)" for f in froms[1:]
        )
        first_alias = froms[0].rsplit(" ", 1)[-1]
        for s in nots:
            where.append(
                f"NOT EXISTS (SELECT 1 FROM {s} nx WHERE nx.doc_id = "
                f"{first_alias}.doc_id)"
            )
        where_sql = ("\n  WHERE " + "\n    AND ".join(where)) if where else ""
        return (
            f"(SELECT {first_alias}.doc_id AS doc_id, {score_expr} AS score"
            f"\n  FROM {from_chain}"
            + (f"\n  {sh_join}" if sh_join else "")
            + where_sql
            + ")"
        )
    raise TypeError(f"query_string oracle: unknown node {node!r}")


def oracle_query_sql(
    queries: list[tuple[int, str]], toks_cte: str, tokenize_sql: str, top_k: int
) -> str:
    """Full DuckDB statement for the query set: shared tscore/posn
    CTEs + one generated subtree per query + the engine rank window.
    Parses with the SAME parser as the engine (the grammar is shared
    planning code; semantics are re-derived in SQL)."""
    trees = [(qid, parse_query_string(q)) for qid, q in queries]
    parts = [
        f"SELECT {qid} AS query_id, doc_id, score FROM {oracle_node_sql(t)} q{qid}"
        for qid, t in trees
    ]
    body = "\n".join(
        "  " + p + (" UNION ALL" if i < len(parts) - 1 else "")
        for i, p in enumerate(parts)
    )
    return f"""
WITH {toks_cte},
tscore AS (
    SELECT tf.term, tf.doc_id,
           ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * (1.2 + 1.0))
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS score
    FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
    CROSS JOIN stats
),
posn AS (
    SELECT doc_id, unnest(toks2) AS term, generate_subscripts(toks2, 1) - 1 AS pos
    FROM (SELECT doc_id, {tokenize_sql} AS toks2 FROM documents)
),
allq AS (
{body}
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INTEGER) AS rank,
       doc_id, round(score, 6) AS score
FROM (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
    FROM allq
) WHERE rank <= {top_k}
"""
