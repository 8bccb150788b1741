"""Query-rewrite operators: term suggestion (autocomplete), fuzzy
(spell-corrected) expansion, and synonym expansion.

These are the analyzer-adjacent features every fulltext engine pairs
with its index (Lucene's FuzzyQuery / SynonymGraphFilter, the
suggester endpoints of Elasticsearch): the QUERY is rewritten against
the index's term dictionary, then scored by the unchanged BM25/WAND
machinery — expansion composes with every retrieval mode because the
output of a rewrite is just another OR query.

No reference analogue (SURVEY.md §2.6): the reference serves verbatim
query strings; these operators exist because a batch engine over web
text meets misspellings and vocabulary mismatch at corpus scale.

Scale design:
- The term dictionary (``term_stats``) is orders of magnitude smaller
  than the corpus (10^7-10^8 terms for 10^12 docs) but still a
  DataFrame, never a driver list. Suggestion and fuzzy scan are ONE
  filtered pass over it; only the capped expansion (<= a few dozen
  terms per query term) is collected.
- Fuzzy matching has two physical strategies with identical results:
  ``expand_fuzzy`` scans the dictionary once with a JVM-side
  ``levenshtein`` filter (right when the query batch amortizes one
  scan), and ``build_deletion_index``/``expand_fuzzy_indexed``
  precomputes the SymSpell delete-1 neighborhood as a parquet-able
  table so each query batch is a broadcast JOIN against it instead of
  a dictionary scan (right for high-QPS serving: the deletion index
  is built once per index snapshot, candidates come from an equi-join
  — no scan, no quadratic term x term work).
- Synonym maps are analyzer resources: tiny, driver-held, applied to
  query strings only. Document-side synonym indexing would double
  index size for the same ranking; query-side expansion is the
  standard trade (Elasticsearch search-time synonyms).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from .postings import InvertedIndex
from .wand import wand_topk

FUZZY_MAX_EXPANSION = 8
SUGGEST_TOP = 8


def suggest_terms(
    index: InvertedIndex,
    prefixes: list[tuple[int, str]],
    top: int = SUGGEST_TOP,
) -> DataFrame:
    """(query_id, rank, term, df): autocomplete — for each prefix the
    ``top`` dictionary completions, most-frequent first (df desc, term
    asc — the suggester order users expect: popular completions win).

    One pass over term_stats: the tiny prefix table broadcasts, the
    per-prefix top-N is a window over matches only (a prefix matches
    a vanishing fraction of the dictionary, and the cap keeps the
    result set at n_prefixes x top rows)."""
    spark = index.term_stats.sparkSession
    pfx = spark.createDataFrame(
        [(qid, p.strip().lower()) for qid, p in prefixes],
        "query_id long, pfx string",
    )
    from pyspark.sql import Window

    matched = index.term_stats.join(
        F.broadcast(pfx), F.col("term").startswith(F.col("pfx"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("df"), F.asc("term"))
    return (
        matched.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("query_id", "rank", "term", "df")
    )


def auto_fuzziness(term: str) -> int:
    """The ES ``fuzziness: AUTO`` ladder: exact below 3 chars, one
    edit for 3-5 chars, two edits above."""
    n = len(term)
    return 0 if n < 3 else (1 if n <= 5 else 2)


def damerau_levenshtein(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein distance — transposition of
    adjacent characters counts as ONE edit, and later edits may pass
    through a transposed pair (so ca->abc is 2, not 3). This is the
    variant DuckDB's ``damerau_levenshtein`` computes, which keeps the
    expansion oracle-checkable; Lucene's FuzzyQuery implements the
    restricted (OSA) variant instead, which differs only on
    edit-through-swap shapes like ca->abc (OSA 3) — on those rare
    shapes our expansion is a superset of Lucene's."""
    la, lb = len(a), len(b)
    maxdist = la + lb
    d = [[maxdist] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    last_row: dict[str, int] = {}
    for i in range(1, la + 1):
        last_col = 0
        for j in range(1, lb + 1):
            k = last_row.get(b[j - 1], 0)
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                this_col = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][last_col] + (i - k - 1) + 1 + (j - last_col - 1),
            )
            if cost == 0:
                last_col = this_col
        last_row[a[i - 1]] = i
    return d[la + 1][lb + 1]


def expand_fuzzy(
    index: InvertedIndex,
    terms: list[str],
    max_distance: int | str = 1,
    max_expansion: int = FUZZY_MAX_EXPANSION,
    prefix_length: int = 0,
    transpositions: bool = False,
) -> dict[str, list[str]]:
    """Dictionary expansion for fuzzy matching: each query term maps
    to the vocabulary terms within its edit budget, highest-df first
    (df desc, term asc), capped at ``max_expansion`` — the FuzzyQuery
    rewrite bound. ``max_distance`` is an int or ``"AUTO"`` (the ES
    default ladder, per term); ``prefix_length`` requires the first N
    characters to match exactly (the Lucene knob that keeps the
    dictionary scan prefix-prunable and kills most false candidates).

    ONE scan of term_stats against the (tiny, broadcast) query-term
    list with a JVM ``levenshtein`` filter, guarded by the free
    length-difference bound and the prefix equality (which at web
    scale is the difference between scanning the vocabulary and
    scanning one prefix range of it). Only the capped expansion
    returns to the driver."""
    qts = sorted({t.strip().lower() for t in terms if t.strip()})
    if not qts:
        return {}
    spark = index.term_stats.sparkSession
    rows = [
        (t, auto_fuzziness(t) if max_distance == "AUTO" else int(max_distance))
        for t in qts
    ]
    qdf = spark.createDataFrame(rows, "qterm string, d int")
    if transpositions:
        # the ES default (fuzzy_transpositions): adjacent swap = 1
        # edit. Exact Damerau-Levenshtein has no JVM built-in, so the
        # vocabulary scan prefilters with the free bounds — DL >=
        # |len diff| and Levenshtein <= 2*DL (a transposition costs 2
        # plain edits) — and only the tiny surviving candidate set
        # pays the Python DL kernel (bounded-Python, never the
        # vocabulary)
        cond = (F.abs(F.length("term") - F.length("qterm")) <= F.col("d")) & (
            F.levenshtein("term", "qterm") <= F.lit(2) * F.col("d")
        )
    else:
        cond = (F.abs(F.length("term") - F.length("qterm")) <= F.col("d")) & (
            F.levenshtein("term", "qterm") <= F.col("d")
        )
    if prefix_length > 0:
        cond = cond & (
            F.substring("term", 1, prefix_length)
            == F.substring("qterm", 1, prefix_length)
        )
    cand = (
        index.term_stats.join(F.broadcast(qdf))
        .filter(cond)
        .select("qterm", "term", "df", "d")
    )
    if transpositions:
        from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

        @pandas_udf("int")
        def _dl(t: pd.Series, q: pd.Series) -> pd.Series:
            return pd.Series(
                [damerau_levenshtein(x, y) for x, y in zip(t, q)], dtype="int32"
            )

        cand = cand.filter(_dl(F.col("term"), F.col("qterm")) <= F.col("d"))
    cand = cand.select("qterm", "term", "df")
    from pyspark.sql import Window

    w = Window.partitionBy("qterm").orderBy(F.desc("df"), F.asc("term"))
    rows = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= max_expansion)
        .collect()
    )
    out: dict[str, list[str]] = {t: [] for t in qts}
    for r in sorted(rows, key=lambda r: (r["qterm"], r["rk"])):
        out[r["qterm"]].append(r["term"])
    return out


def build_deletion_index(index: InvertedIndex) -> DataFrame:
    """(variant, term, df): the SymSpell delete-1 neighborhood of the
    term dictionary — each term keyed by itself and by every
    single-character deletion of itself.

    Built ONCE per index snapshot (write it next to the postings), it
    turns fuzzy candidate generation into an equi-join: two strings
    within one edit always share a delete-1 variant, so joining query
    variants against this table finds every distance<=1 candidate
    without scanning the dictionary (the join key is hashable — a
    broadcast or shuffle-hash join, never a Cartesian levenshtein
    sweep). ~(1 + avg_term_len) rows per dictionary term."""
    variants = F.array_union(
        F.array(F.col("term")),
        F.transform(
            F.sequence(F.lit(1), F.length("term")),
            lambda i: F.concat(
                F.substring(F.col("term"), F.lit(1), i - 1),
                F.col("term").substr(i + 1, F.length("term")),
            ),
        ),
    )
    return index.term_stats.select(
        F.explode(variants).alias("variant"), "term", "df"
    )


def _delete1_variants(term: str) -> list[str]:
    return [term] + [term[:i] + term[i + 1 :] for i in range(len(term))]


def expand_fuzzy_indexed(
    deletion_index: DataFrame,
    terms: list[str],
    max_expansion: int = FUZZY_MAX_EXPANSION,
) -> dict[str, list[str]]:
    """Same result as ``expand_fuzzy(max_distance=1)`` but against a
    precomputed deletion index: query delete-1 variants equi-join the
    dictionary's, then the (few) candidates are verified with an
    exact levenshtein <= 1 — the SymSpell shape, where candidate
    generation is a join on a hash key instead of a dictionary scan."""
    qts = sorted({t.strip().lower() for t in terms if t.strip()})
    if not qts:
        return {}
    spark = deletion_index.sparkSession
    qvar = spark.createDataFrame(
        [(t, v) for t in qts for v in _delete1_variants(t)],
        "qterm string, variant string",
    )
    cand = (
        deletion_index.join(F.broadcast(qvar), "variant")
        .select("qterm", "term", "df")
        .distinct()
        # delete-1 overlap admits some distance-2 pairs; verify exactly
        .filter(F.levenshtein("term", "qterm") <= 1)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qterm").orderBy(F.desc("df"), F.asc("term"))
    rows = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= max_expansion)
        .collect()
    )
    out: dict[str, list[str]] = {t: [] for t in qts}
    for r in sorted(rows, key=lambda r: (r["qterm"], r["rk"])):
        out[r["qterm"]].append(r["term"])
    return out


def fuzzy_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_distance: int | str = 1,
    max_expansion: int = FUZZY_MAX_EXPANSION,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
    prefix_length: int = 0,
    transpositions: bool = False,
) -> DataFrame:
    """(query_id, rank, doc_id, score): spell-tolerant retrieval —
    every query term expands to its fuzzy dictionary neighborhood
    (exact term included, it is distance 0) and the query scores as
    the disjunctive BM25 of the union, through the unchanged WAND
    machinery. Equivalent to an OR query over the expanded term set,
    so the brute-force oracle is standard BM25 with that set.
    ``max_distance="AUTO"`` and ``prefix_length`` follow the ES
    FuzzyQuery defaults (see expand_fuzzy)."""
    all_terms = {
        tok for _qid, q in queries for tok in q.strip().lower().split() if tok
    }
    exp = expand_fuzzy(
        index, sorted(all_terms), max_distance, max_expansion, prefix_length,
        transpositions,
    )
    synth: list[tuple[int, str]] = []
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.strip().lower().split():
            for t in exp.get(tok, ()):
                if t not in terms:
                    terms.append(t)
        if terms:
            synth.append((qid, " ".join(terms)))
    if not synth:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return wand_topk(index, synth, k, k1, b, taat_threshold)


def expand_synonyms(
    queries: list[tuple[int, str]], groups: list[list[str]]
) -> list[tuple[int, str]]:
    """Search-time synonym expansion: each query term joined by every
    member of its synonym group (analyzer resource, driver-held —
    synonym maps are small config, not data). A term in no group
    passes through; expansion preserves first-seen order and dedupes,
    matching the engine's query tokenization contract."""
    syn: dict[str, list[str]] = {}
    for g in groups:
        canon = [t.strip().lower() for t in g if t.strip()]
        for t in canon:
            syn[t] = canon
    out: list[tuple[int, str]] = []
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.strip().lower().split():
            if not tok:
                continue
            for t in syn.get(tok, [tok]):
                if t not in terms:
                    terms.append(t)
        out.append((qid, " ".join(terms)))
    return out


def synonym_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    groups: list[list[str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score): synonym-expanded retrieval —
    the rewritten OR query through the unchanged WAND machinery (each
    expanded term keeps its OWN idf, the equal-weight union semantics
    of Lucene's SynonymQuery applied at the whole-query level)."""
    return wand_topk(index, expand_synonyms(queries, groups), k, k1, b, taat_threshold)


def spell_correct(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    max_distance: int = 1,
) -> DataFrame:
    """(query_id, corrected, n_corrections): did-you-mean query
    correction — each out-of-vocabulary token is replaced by its
    highest-df dictionary term within ``max_distance`` edits (ties:
    term asc); in-vocabulary tokens and unfixable garbage pass
    through. Token order and multiplicity are preserved (this
    rewrites the query STRING, unlike the set-semantics scorers).

    The vocabulary probe is the handle's memoized df lookup; only
    genuinely OOV tokens pay the fuzzy dictionary scan. The rewritten
    queries are driver values (queries are driver values to begin
    with) — feed them to any retrieval mode."""
    toks_per_q = [(qid, q.strip().lower().split()) for qid, q in queries]
    all_terms = {t for _qid, ts in toks_per_q for t in ts}
    dfs = index.df_for_terms(all_terms) if all_terms else {}
    oov = sorted(t for t in all_terms if dfs[t] == 0)
    exp = (
        expand_fuzzy(index, oov, max_distance, max_expansion=1) if oov else {}
    )
    rows = []
    for qid, ts in toks_per_q:
        corrected: list[str] = []
        n = 0
        for t in ts:
            fix = exp.get(t)
            if dfs.get(t, 0) > 0 or not fix:
                corrected.append(t)
            else:
                corrected.append(fix[0])
                n += 1
        rows.append((qid, " ".join(corrected), n))
    spark = index.term_stats.sparkSession
    return spark.createDataFrame(
        rows, "query_id long, corrected string, n_corrections long"
    )


# ---- Phrase suggester (ES "phrase" suggest: did-you-mean over a ----
# ---- bigram LM instead of per-term edit distance alone)         ----

SUGGEST_MAX_CAND = 4  # candidate terms per query slot (incl. the original)
SUGGEST_LAMBDA = 0.7  # bigram/unigram interpolation (matches textstats LM)
SUGGEST_FLOOR = 1e-12  # probability floor for OOV/zero-mass sequences
SUGGEST_MAX_SEQ = 4096  # enumeration guard: max candidate sequences/query


def phrase_suggest(
    spark,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    max_distance: int = 1,
    max_candidates: int = SUGGEST_MAX_CAND,
    lam: float = SUGGEST_LAMBDA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, suggestion, score): the Elasticsearch ``phrase``
    suggester — whole-query did-you-mean. Each query token generates
    candidate terms (itself plus vocabulary terms within
    ``max_distance`` edits, original first, then collection-frequency
    desc / term asc, capped at ``max_candidates``); every candidate
    SEQUENCE is scored under the corpus interpolated bigram LM

        ln p(c1) + sum_i ln( lam*cf2(c_{i-1} c_i)/cf(c_{i-1})
                             + (1-lam)*cf(c_i)/C )

    (unigram start, probabilities floored at SUGGEST_FLOOR so OOV
    tokens stay scorable), and the best-scoring sequence wins (ties:
    rounded score desc, suggestion string asc). Unlike per-term
    ``spell_correct``, context picks the fix: a real-word error
    corrects when its neighbors make another candidate's bigrams
    likelier — the reason ES layers this suggester over the term one.

    Scale shape: two corpus-side aggregations feed a driver-side
    lattice. Candidate generation is one levenshtein-filtered scan of
    the unigram table (vocabulary-sized, length-difference guard);
    bigram counts are computed ONLY for candidate adjacent pairs —
    the tiny pair list broadcast-joins into the exploded bigram
    stream BEFORE its combinable count agg, so corpus work is one
    filtered pass regardless of vocabulary size. The enumeration is
    queries x <= SUGGEST_MAX_SEQ driver tuples (planning-sized); a
    lattice wider than the guard deterministically trims its longest
    slot lists first."""
    import itertools  # noqa: PLC0415
    import math  # noqa: PLC0415

    from pyspark.sql import Window  # noqa: PLC0415

    from ..functions.udfs import tokenize_for_scoring  # noqa: PLC0415
    from .bm25 import term_freqs  # noqa: PLC0415
    from .textstats import _ngrams  # noqa: PLC0415

    toks_per_q = [
        (qid, q.strip().lower().split()) for qid, q in queries if q.strip()
    ]
    orig_terms = sorted({t for _qid, ts in toks_per_q for t in ts})
    if not orig_terms:
        return spark.createDataFrame(
            [], "query_id long, suggestion string, score double"
        )

    cf1 = (
        term_freqs(docs, id_col, text_col)
        .groupBy("term")
        .agg(F.sum("tf").alias("cf"))
    )
    total = cf1.agg(F.sum("cf").alias("c")).collect()[0]["c"]
    c_total = float(total or 0)

    qdf = spark.createDataFrame([(t,) for t in orig_terms], "orig string")
    cand = (
        cf1.join(F.broadcast(qdf))
        .filter(
            (F.abs(F.length("term") - F.length("orig")) <= max_distance)
            & (F.levenshtein("term", "orig") <= max_distance)
        )
        .withColumn("is_orig", (F.col("term") == F.col("orig")).cast("int"))
    )
    w = Window.partitionBy("orig").orderBy(
        F.desc("is_orig"), F.desc("cf"), F.asc("term")
    )
    picked = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= max_candidates)
        .collect()
    )
    cands: dict[str, list[str]] = {t: [] for t in orig_terms}
    cf_map: dict[str, float] = {}
    for r in sorted(picked, key=lambda r: (r["orig"], r["rk"])):
        cands[r["orig"]].append(r["term"])
        cf_map[r["term"]] = float(r["cf"])
    for t in orig_terms:
        if not cands[t]:
            cands[t] = [t]  # unfixable OOV passes through, floor-scored

    pairs: set[tuple[str, str]] = set()
    for _qid, ts in toks_per_q:
        slots = [cands[t] for t in ts]
        while math.prod(len(s) for s in slots) > SUGGEST_MAX_SEQ:
            slots[max(range(len(slots)), key=lambda i: len(slots[i]))] = slots[
                max(range(len(slots)), key=lambda i: len(slots[i]))
            ][:-1]
        for a, b in zip(slots, slots[1:]):
            pairs.update(itertools.product(a, b))
    cf2_map: dict[tuple[str, str], float] = {}
    if pairs:
        pdf = spark.createDataFrame(sorted(pairs), "w1 string, w2 string")
        grams = docs.select(
            F.explode(_ngrams(tokenize_for_scoring(F.col(text_col)), 2)).alias("g")
        ).select(
            F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"),
        )
        for r in (
            grams.join(F.broadcast(pdf), ["w1", "w2"])
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("cf2"))
            .collect()
        ):
            cf2_map[(r["w1"], r["w2"])] = float(r["cf2"])

    def p1(t: str) -> float:
        if c_total <= 0:
            return SUGGEST_FLOOR
        return max(cf_map.get(t, 0.0) / c_total, SUGGEST_FLOOR)

    def p2(a: str, b: str) -> float:
        ca = cf_map.get(a, 0.0)
        bg = lam * cf2_map.get((a, b), 0.0) / ca if ca > 0 else 0.0
        uni = (1.0 - lam) * cf_map.get(b, 0.0) / c_total if c_total > 0 else 0.0
        return max(bg + uni, SUGGEST_FLOOR)

    out = []
    for qid, ts in toks_per_q:
        slots = [cands[t] for t in ts]
        while math.prod(len(s) for s in slots) > SUGGEST_MAX_SEQ:
            slots[max(range(len(slots)), key=lambda i: len(slots[i]))] = slots[
                max(range(len(slots)), key=lambda i: len(slots[i]))
            ][:-1]
        best: tuple | None = None
        for seq in itertools.product(*slots):
            s = round(
                math.log(p1(seq[0]))
                + sum(math.log(p2(a, b)) for a, b in zip(seq, seq[1:])),
                6,
            )
            key = (-s, " ".join(seq))
            if best is None or key < best[0]:
                best = (key, " ".join(seq), s)
        out.append((qid, best[1], float(best[2])))
    return spark.createDataFrame(
        out, "query_id long, suggestion string, score double"
    )


def corpus_bigram_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(a, b, cab): adjacent-bigram counts over the corpus, built
    WITHOUT a positions self-join — one array-zip projection
    (toks[i], toks[i+1]) per doc and a combinable count agg, the same
    single-pass shape as the unigram stats. At 10^12 docs this is the
    difference between one token-stream pass and a join of the token
    stream against itself."""
    from ..functions.udfs import tokenize_for_scoring  # noqa: PLC0415

    toks = docs.select(tokenize_for_scoring(F.col(text_col)).alias("toks")).filter(
        F.size("toks") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at("toks", i).alias("a"),
                    F.element_at("toks", i + 1).alias("b"),
                ),
            )
        ).alias("p")
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.count(F.lit(1)).alias("cab")
    )


def segment_queries_by_pmi(
    spark,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    min_pmi: float = 0.1,
    min_count: int = 5,
    text_col: str = "text",
) -> dict[int, list[tuple[str, str]]]:
    """query_id -> the adjacent token pairs that segment into PHRASE
    clauses: corpus PMI(a,b) = ln(P(ab) / (P(a) P(b))) >= min_pmi with
    support cab >= min_count (P(ab) over the bigram stream, P(x) over
    the token stream). PMI rounded to 6dp before thresholding so the
    decision is fp-stable across engines. The collect is
    planning-sized: one row per adjacent query pair."""
    from .bm25 import tokens as token_stream  # noqa: PLC0415

    want = []
    for qid, q in queries:
        ts = [t for t in q.strip().lower().split() if t]
        for i in range(len(ts) - 1):
            want.append((qid, ts[i], ts[i + 1]))
    if not want:
        return {}
    pairs = spark.createDataFrame(want, "query_id long, a string, b string")
    uni = token_stream(docs, text_col=text_col).groupBy("term").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = uni.agg(F.sum("c").alias("t"))
    bi = corpus_bigram_stats(docs, text_col)
    btot = bi.agg(F.sum("cab").alias("bt"))
    scored = (
        F.broadcast(pairs)
        .join(bi, ["a", "b"])
        .join(uni.select(F.col("term").alias("a"), F.col("c").alias("ca")), "a")
        .join(uni.select(F.col("term").alias("b"), F.col("c").alias("cb")), "b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "query_id",
            "a",
            "b",
            "cab",
            F.round(
                F.log(
                    (F.col("cab") / F.col("bt"))
                    / ((F.col("ca") / F.col("t")) * (F.col("cb") / F.col("t")))
                ),
                6,
            ).alias("pmi"),
        )
        .filter((F.col("pmi") >= min_pmi) & (F.col("cab") >= min_count))
        .collect()
    )
    out: dict[int, list[tuple[str, str]]] = {}
    for r in scored:
        out.setdefault(r["query_id"], []).append((r["a"], r["b"]))
    return out


def segmented_topk_bruteforce(
    spark,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    min_pmi: float = 0.1,
    min_count: int = 5,
) -> DataFrame:
    """(query_id, rank, doc_id, score): PMI query segmentation — the
    classic query-rewrite that upgrades statistically-collocated
    adjacent query tokens ("new york", "machine learning") to exact
    PHRASE filters while the query still scores as the usual BM25 OR
    over its terms. A doc must contain EVERY segmented bigram
    adjacently (filter context, like ES bool.filter: no score
    contribution beyond the term scores); queries with no collocated
    pairs degrade to plain BM25.

    Scale shape: bigram/unigram stats are single-pass combinable aggs;
    the segmentation decision collects only the query's own pairs; the
    phrase filter is a broadcast of (query, needle) clauses against
    the padded token string — the phrase oracle's plan, corpus scanned
    once for all clauses."""
    from ..functions.udfs import tokenize_for_scoring  # noqa: PLC0415
    from .bm25 import bm25_scores_bruteforce, query_terms, topk  # noqa: PLC0415

    seg = segment_queries_by_pmi(spark, docs, queries, min_pmi, min_count)
    qt = query_terms(spark, queries)
    scored = bm25_scores_bruteforce(docs, qt)
    clause_rows = [
        (qid, f" {a} {b} ") for qid, pairs in seg.items() for a, b in pairs
    ]
    if not clause_rows:
        return topk(scored, k).select("query_id", "rank", "doc_id", "score")
    clauses = spark.createDataFrame(clause_rows, "query_id long, needle string")
    n_clauses = clauses.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_cl"))
    padded = docs.select(
        "doc_id",
        F.concat(
            F.lit(" "),
            F.concat_ws(" ", tokenize_for_scoring(F.col("text"))),
            F.lit(" "),
        ).alias("s"),
    )
    allowed = (
        padded.crossJoin(F.broadcast(clauses))
        .filter(F.expr("instr(s, needle) > 0"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(F.broadcast(n_clauses), "query_id")
        .filter(F.col("n_hit") == F.col("n_cl"))
        .select("query_id", "doc_id")
    )
    seg_qids = list(seg)
    keep = scored.join(allowed, ["query_id", "doc_id"], "left_semi").unionByName(
        scored.filter(~F.col("query_id").isin(seg_qids))
    )
    return topk(keep, k).select("query_id", "rank", "doc_id", "score")


def context_suggest(
    spark,
    docs: DataFrame,
    prefixes: list[tuple[int, str, str]],
    context_col: str = "lang",
    top: int = SUGGEST_TOP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, term, df): the ES completion suggester with
    CONTEXTS — each request is (id, prefix, context value) and
    completions are ranked by document frequency WITHIN the context
    (e.g. language), df desc / term asc, top-``top``. A term that is
    popular globally but absent from the request's context never
    surfaces — the point of suggester contexts.

    Scale shape: per-(term, context) df is one combinable agg over
    the distinct (doc, term) pairs joined to the doc's context column
    (the same join shape the faceted scorer uses); the tiny request
    table broadcasts into a prefix-match join and the per-request
    top-N windows over matches only."""
    from pyspark.sql import Window

    from ..functions.udfs import tokenize_for_scoring

    req = spark.createDataFrame(
        [(qid, p.strip().lower(), c) for qid, p, c in prefixes],
        "query_id long, pfx string, ctx string",
    )
    doc_terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(context_col).alias("ctx"),
        F.explode(F.array_distinct(tokenize_for_scoring(F.col(text_col)))).alias("term"),
    )
    ctx_df = doc_terms.groupBy("term", "ctx").agg(F.count(F.lit(1)).alias("df"))
    matched = ctx_df.join(
        F.broadcast(req),
        (F.col("term").startswith(F.col("pfx"))) & (ctx_df["ctx"] == req["ctx"]),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("df"), F.asc("term"))
    return (
        matched.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("query_id", "rank", "term", "df")
    )


# ---------------------------------------------------------------------------
# Phonetic matching (the ES phonetic-analysis plugin / Lucene
# SoundexFilter surface): sounds-alike retrieval via a Soundex-class
# key. The key here is classic American Soundex WITHOUT the H/W
# separator rule (adjacent equal codes collapse regardless of an
# intervening h/w) — one documented simplification, chosen so the key
# is a pure function of translate + regexp_replace + substring, the
# exact same primitive chain in Spark (JVM codegen, no UDF) and in the
# DuckDB oracle, making the expansion bit-for-bit checkable.
# ---------------------------------------------------------------------------

# a->0 b->1 c->2 d->3 e->0 f->1 g->2 h->0 i->0 j->2 k->2 l->4 m->5
# n->5 o->0 p->1 q->2 r->6 s->2 t->3 u->0 v->1 w->0 x->2 y->0 z->2
_SOUNDEX_CODES = "01230120022455012623010202"
_AZ = "abcdefghijklmnopqrstuvwxyz"


def phonetic_key_col(col: F.Column) -> F.Column:
    """Soundex-class key of a token as a pure-JVM column expression:
    first letter + first three non-zero codes of the run-collapsed
    coded tail, zero-padded — e.g. joyn/join -> j500, tabel/table ->
    t140. Empty after [^a-z] stripping -> '000' (callers filter)."""
    letters = F.regexp_replace(F.lower(col), "[^a-z]", "")
    coded = F.translate(letters, _AZ, _SOUNDEX_CODES)
    for d in "0123456":
        coded = F.regexp_replace(coded, f"{d}{d}+", d)
    tail = F.translate(F.substring(coded, 2, 64), "0", "")
    return F.concat(
        F.substring(letters, 1, 1), F.substring(F.rpad(tail, 3, "0"), 1, 3)
    )


def phonetic_key_sql(expr: str) -> str:
    """The identical key as a DuckDB SQL expression over ``expr`` —
    same translate / run-collapse / strip / pad chain, so oracle and
    engine agree on every key."""
    coded = f"translate(regexp_replace(lower({expr}), '[^a-z]', '', 'g'), '{_AZ}', '{_SOUNDEX_CODES}')"
    for d in "0123456":
        coded = f"regexp_replace({coded}, '{d}{d}+', '{d}', 'g')"
    letters = f"regexp_replace(lower({expr}), '[^a-z]', '', 'g')"
    tail = f"translate(substr({coded}, 2, 64), '0', '')"
    return (
        f"concat(substr({letters}, 1, 1), substr(rpad({tail}, 3, '0'), 1, 3))"
    )


def phonetic_key_py(word: str) -> str:
    """Driver-side mirror of ``phonetic_key_col`` for query tokens."""
    import re as _re

    letters = _re.sub(r"[^a-z]", "", word.lower())
    coded = letters.translate(str.maketrans(_AZ, _SOUNDEX_CODES))
    for d in "0123456":
        coded = _re.sub(f"{d}{d}+", d, coded)
    tail = coded[1:65].replace("0", "")
    return (letters[:1] + (tail + "000")[:3])[:4] if letters else "000"


def expand_phonetic(
    index: InvertedIndex,
    tokens: list[str],
    max_expansion: int = FUZZY_MAX_EXPANSION,
) -> dict[str, list[str]]:
    """token -> matching vocabulary terms that share its phonetic key,
    df-desc / term-asc capped at ``max_expansion`` per token — the same
    neighborhood-cap rule as fuzzy expansion. One dictionary scan for
    ALL tokens (key equality against a broadcast key set), never a
    per-token pass."""
    keys = {t: phonetic_key_py(t) for t in tokens if t}
    keys = {t: k for t, k in keys.items() if k != "000"}
    if not keys:
        return {}
    wanted = sorted(set(keys.values()))
    rows = (
        index.term_stats.withColumn("pkey", phonetic_key_col(F.col("term")))
        .filter(F.col("pkey").isin(wanted))
        .select("pkey", "term", "df")
        .collect()
    )
    by_key: dict[str, list[str]] = {}
    for r in sorted(rows, key=lambda r: (-r["df"], r["term"])):
        by_key.setdefault(r["pkey"], []).append(r["term"])
    return {
        t: by_key.get(k, [])[:max_expansion] for t, k in keys.items()
    }


def phonetic_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansion: int = FUZZY_MAX_EXPANSION,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score): sounds-alike retrieval — every
    query token expands to the dictionary terms sharing its phonetic
    key and the query scores as the disjunctive BM25 of the union
    through the unchanged WAND machinery (same contract as
    fuzzy_topk; the oracle is standard BM25 over the expansion).

    Scale shape: the expansion is one key-equality dictionary scan
    (pushdown-able isin on a derived column; at 10^12 docs the pkey
    column is a build-time sidecar like the rterm field), and the
    retrieval itself reads only the expansion terms' postings."""
    all_terms = {
        tok for _qid, q in queries for tok in q.strip().lower().split() if tok
    }
    exp = expand_phonetic(index, sorted(all_terms), max_expansion)
    synth: list[tuple[int, str]] = []
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.strip().lower().split():
            for t in exp.get(tok, ()):
                if t not in terms:
                    terms.append(t)
        if terms:
            synth.append((qid, " ".join(terms)))
    if not synth:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return wand_topk(index, synth, k, k1, b, taat_threshold)
