"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure JVM-side expressions (whole-stage codegen; no Python) —
the per-row work a 100 TB ingest pipeline runs on every document.
The token-count semantics mirror the reference's usage accounting
(whitespace split, ``embedding_service.py:107``) and its ~4-chars-per-
token estimate (``text_utils.py:63``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import tokenize_for_scoring

# tiny per-language stopword signatures for the n-gram/stopword
# heuristic language detector (deterministic, oracle-portable)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "los", "es", "de", "que"],
    "fr": ["le", "la", "les", "est", "une", "des"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count (reference usage accounting)."""
    return F.size(tokenize_for_scoring(col))


def token_estimate(col: Column) -> Column:
    """chars//4 token estimate (reference text_utils.py:63)."""
    return (F.length(col) / 4).cast("int")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish count: split on whitespace AND punctuation/digit
    boundaries — a regex stand-in for BPE fragment counting."""
    pieces = F.split(
        F.trim(F.lower(col)), r"(\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])|(?=[^\w\s])|(?<=[^\w\s]))"
    )
    return F.size(F.filter(pieces, lambda t: t != F.lit("")))


def lang_scores(col: Column) -> Column:
    """map<lang, double>: fraction of tokens matching each language's
    stopword signature."""
    toks = tokenize_for_scoring(col)
    entries = []
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        frac = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))) / F.greatest(
            F.size(toks), F.lit(1)
        )
        entries.extend([F.lit(lang), frac])
    return F.create_map(*entries)


def lang_id(col: Column, min_score: float = 0.01) -> Column:
    """Best-scoring language or 'und' when nothing clears min_score."""
    toks = tokenize_for_scoring(col)
    best_lang = F.lit("und")
    best_score = F.lit(float(min_score))
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        frac = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))) / F.greatest(
            F.size(toks), F.lit(1)
        )
        is_better = frac > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, frac).otherwise(best_score)
    return best_lang


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features: lengths, punctuation/digit/upper
    ratios, mean word length, stopword ratio, distinct-token ratio."""
    c = F.col(text_col)
    toks = tokenize_for_scoring(c)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.greatest(F.length(c), F.lit(1))
    en = F.array(*[F.lit(m) for m in _LANG_MARKERS["en"]])
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(c).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        (F.length(F.regexp_replace(c, r"[^.!?,;:]", "")) / n_chars).alias("punct_ratio"),
        (F.length(F.regexp_replace(c, r"[^0-9]", "")) / n_chars).alias("digit_ratio"),
        (F.length(F.regexp_replace(c, r"[^A-Z]", "")) / n_chars).alias("upper_ratio"),
        (F.length(F.regexp_replace(c, r"\s", "")) / n_toks).alias("mean_word_len"),
        (F.size(F.filter(toks, lambda t: F.array_contains(en, t))) / n_toks).alias(
            "stopword_ratio"
        ),
        (F.size(F.array_distinct(toks)) / n_toks).alias("distinct_ratio"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: penalize too-short/too-long docs,
    reward moderate punctuation + high distinct ratio. Deterministic
    arithmetic (oracle-portable)."""
    f = quality_features(docs, id_col, text_col)
    len_ok = F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 5000), 1.0).otherwise(0.3)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.5)
    return f.select(
        "doc_id",
        F.round(
            len_ok * 0.4 + punct_ok * 0.2 + F.least(F.col("distinct_ratio"), F.lit(1.0)) * 0.4,
            6,
        ).alias("quality"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fp): md5 of the dedup-normalized text — the content
    fingerprint for exact-dup detection and lineage."""
    from .dedup import normalized_text

    return docs.select(
        F.col(id_col).alias("doc_id"), F.md5(normalized_text(F.col(text_col))).alias("fp")
    )


def rolling_fingerprints(
    docs: DataFrame,
    window_tokens: int = 32,
    stride: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, fp): md5 fingerprints of overlapping token windows
    — the building block for contained-duplicate (quote) detection."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_for_scoring(F.col(text_col)).alias("toks")
    )
    n_windows = F.greatest(
        F.floor((F.size("toks") - window_tokens) / stride).cast("int") + 1, F.lit(1)
    )
    return toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_windows - 1)).alias("pos"),
        "toks",
    ).select(
        "doc_id",
        "pos",
        F.md5(F.array_join(F.slice("toks", F.col("pos") * stride + 1, window_tokens), " ")).alias(
            "fp"
        ),
    )


def cooccurrence_pmi(
    docs: DataFrame,
    min_pair_count: int = 5,
    max_term_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term_a, term_b, pair_count, pmi): document-level co-occurrence
    with pointwise mutual information — the corpus-analytics operator
    behind collocation mining and topic drift checks.

    pmi = ln( (pair_count * n_docs) / (df_a * df_b) ), computed over
    DISTINCT per-doc terms with term_a < term_b (unordered pairs).

    Scale shape: the pair space is the quadratic hazard — a doc with
    m distinct terms emits m^2/2 pairs. Two caps bound it:
    ``max_term_df`` drops corpus-hot terms BEFORE pairing (same
    df-cap pattern as the dedup shingle pipeline — hot terms carry no
    collocation signal and dominate the pair count), and
    ``min_pair_count`` prunes the long tail after one map-side
    combinable count. The pair build is a per-doc self-join on the
    distinct-terms table — co-partitioned on doc_id, so it shuffles
    the term table twice and nothing else."""
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize_for_scoring(F.col(text_col)))).alias(
            "term"
        ),
    )
    n_docs = docs.select(id_col).distinct().count()
    df_tbl = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_term_df is not None:
        df_tbl = df_tbl.filter(F.col("df") <= max_term_df)
        terms = terms.join(F.broadcast(df_tbl.select("term")), "term")
    a = terms.select("doc_id", F.col("term").alias("term_a"))
    b = terms.select("doc_id", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    dfa = df_tbl.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    dfb = df_tbl.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    return pairs.join(F.broadcast(dfa), "term_a").join(
        F.broadcast(dfb), "term_b"
    ).select(
        "term_a",
        "term_b",
        "pair_count",
        F.log(
            F.col("pair_count") * F.lit(float(n_docs))
            / (F.col("df_a") * F.col("df_b"))
        ).alias("pmi"),
    )


def doc_tfidf_topn(docs: DataFrame, n: int = 5) -> DataFrame:
    """(doc_id, rank, term, tf, tfidf): each document's ``n`` most
    characteristic terms by tf-idf (BM25-family idf, raw tf), ties
    term-asc — the per-document keyword/featurization export a
    training-data pipeline attaches to every example (and the raw
    material for more_like_this seeds).

    Pure JVM plan: the tf table is the usual map-side-combinable agg,
    df/n_docs hang off it, the per-doc top-n is a window partitioned
    by doc — fully parallel in the number of documents, no Python."""
    from .bm25 import corpus_stats, doc_freqs, doc_lengths, term_freqs

    tf = term_freqs(docs)
    df = doc_freqs(tf)
    cs = corpus_stats(doc_lengths(tf))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(cs.select("n_docs")))
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("tfidf", 6)), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("doc_id", "rank", "term", "tf", "tfidf")
    )


def unigram_cross_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dl, ce): per-token cross-entropy of each doc under the
    CORPUS unigram language model: ce = -(1/dl) * sum_t tf_t * ln(cf_t/C)
    with cf = corpus frequency of t and C = total corpus tokens.

    The cheap LM-quality proxy corpus filters threshold on (CCNet runs
    a real KenLM perplexity; the unigram form needs only corpus term
    counts and is deterministic/oracle-portable): LOW ce = the doc is
    made of the corpus's most common tokens (boilerplate, nav chrome,
    keyword stuffing), HIGH ce = rare-token soup (binary junk, lang
    mismatch) — filters usually keep a middle band. Docs with dl = 0
    get ce = 0.0.

    Scale shape: two map-side-combinable aggregations over the same
    tokenize explode the index build already pays (per-doc tf, then
    per-term cf), one join of the tf stream against the vocabulary
    (term-keyed, broadcastable when the vocab fits — at web scale it
    is hash-partitioned by term like the posting build), and a final
    per-doc sum. No Python, no window over the corpus.
    """
    from .bm25 import term_freqs  # noqa: PLC0415

    tf = term_freqs(docs, id_col=id_col, text_col=text_col)
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf").alias("c"))
    scored = (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("dl"),
            (-F.sum(F.col("tf") * F.log(F.col("cf") / F.col("c"))) / F.sum("tf")).alias(
                "ce"
            ),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dl", F.lit(0)).alias("dl"),
            F.round(F.coalesce("ce", F.lit(0.0)), 6).alias("ce"),
        )
    )


def domain_stats(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, total_tokens, avg_dl, mean_quality, dup_docs):
    the per-host corpus report a crawl-curation loop reads — which
    hosts dominate the token budget, which are boilerplate mills
    (low mean quality), which re-serve the same page under many urls
    (``dup_docs`` = docs minus distinct normalized texts within the
    host).

    Scale shape: one map-side-combinable aggregation keyed by source
    (hosts are numerous, so the key space is fine-grained; a single
    mega-host is bounded because every agg here is combinable), plus
    the per-doc quality projection it rides on. count_distinct(nrm)
    shuffles (source, nrm) pairs once — the same cardinality as exact
    dedup's hash agg.
    """
    from .dedup import normalized_text  # noqa: PLC0415

    q = quality_score(docs, id_col=id_col, text_col=text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.size(tokenize_for_scoring(F.col(text_col))).alias("dl"),
        normalized_text(F.col(text_col)).alias("nrm"),
    ).join(q, "doc_id")
    return (
        base.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").cast("long").alias("total_tokens"),
            F.round(F.avg("dl"), 6).alias("avg_dl"),
            F.round(F.avg("quality"), 6).alias("mean_quality"),
            (F.count(F.lit(1)) - F.count_distinct("nrm")).alias("dup_docs"),
        )
    )


def _nonempty_lines(col: Column, sep: str) -> Column:
    """array<string>: ``col`` split on ``sep``, trimmed, empties out."""
    parts = F.transform(F.split(col, sep), lambda p: F.trim(p))
    return F.filter(parts, lambda p: p != F.lit(""))


def _excess_dup_frac(arr: Column, weight) -> Column:
    """Fraction of ``weight`` carried by EXCESS duplicate occurrences
    of elements in ``arr`` (an element seen c times contributes c-1
    excess copies): 1 - weight(distinct)/weight(all). ``weight`` maps
    an array column to a numeric column (count or total chars)."""
    total = weight(arr)
    return F.when(
        total > 0, (total - weight(F.array_distinct(arr))) / total
    ).otherwise(F.lit(0.0))


def _ngrams(toks: Column, n: int) -> Column:
    """array<string>: the doc's token ``n``-grams (space-joined),
    empty when the doc has fewer than ``n`` tokens. Built by zipping
    ``n`` shifted slices — pure JVM array ops, no explode."""
    ln = F.size(toks) - (n - 1)
    grams = F.slice(toks, 1, F.greatest(ln, F.lit(0)))
    for i in range(1, n):
        nxt = F.slice(toks, i + 1, F.greatest(ln, F.lit(0)))
        grams = F.zip_with(grams, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return grams


def _top_gram_frac(grams: Column) -> Column:
    """Fraction of the doc's n-grams taken by its single most frequent
    n-gram: sort the gram array, then one ``aggregate`` pass tracks the
    longest run of equal adjacent elements — per-row JVM fold, no
    per-doc groupBy, no Python."""
    srt = F.array_sort(grams)
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    best = F.aggregate(srt, zero, step, lambda acc: acc["best"])
    return F.when(F.size(grams) > 0, best / F.size(grams)).otherwise(F.lit(0.0))


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    dup_para_frac, top_bigram_frac, top_trigram_frac): the Gopher-rule
    repetition signals (Rae et al. 2021, table A1) a pretraining
    corpus filter thresholds on — boilerplate pages repeat nav lines,
    SEO spam repeats the same bigram, scraped forums repeat quoted
    paragraphs.

    Definitions (pinned; the dup-char fraction counts chars in EXCESS
    duplicate occurrences, a deterministic variant of Gopher's
    duplicate-line character fraction):
    - ``dup_line_frac``     = 1 - distinct_lines / lines (trimmed,
      non-empty lines; 0 for docs with no lines)
    - ``dup_line_char_frac``= 1 - chars(distinct lines)/chars(lines)
    - ``dup_para_frac``     = same as dup_line_frac over blank-line
      separated paragraphs
    - ``top_{bi,tri}gram_frac`` = occurrences of the most frequent
      token {2,3}-gram / total {2,3}-grams (0 when the doc is shorter
      than the gram)

    Scale shape: a pure per-row projection — every signal is a JVM
    array fold over the doc's own tokens/lines (whole-stage codegen,
    no Python, no explode, no shuffle). At 10^12 docs this pipelines
    with the scan exactly like ``quality_features``.
    """
    c = F.col(text_col)
    toks = tokenize_for_scoring(c)
    lines = _nonempty_lines(c, r"\n")
    paras = _nonempty_lines(c, r"\n\s*\n")
    n_chars = lambda a: F.aggregate(  # noqa: E731
        a, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.round(_excess_dup_frac(lines, F.size), 6).alias("dup_line_frac"),
        F.round(_excess_dup_frac(lines, n_chars), 6).alias("dup_line_char_frac"),
        F.round(_excess_dup_frac(paras, F.size), 6).alias("dup_para_frac"),
        F.round(_top_gram_frac(_ngrams(toks, 2)), 6).alias("top_bigram_frac"),
        F.round(_top_gram_frac(_ngrams(toks, 3)), 6).alias("top_trigram_frac"),
    )


BIGRAM_LAMBDA = 0.7


def bigram_cross_entropy(
    docs: DataFrame,
    lam: float = BIGRAM_LAMBDA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, ce): per-bigram cross-entropy of each doc
    under the CORPUS interpolated bigram language model —

        p(w2 | w1) = lam * cf2(w1 w2)/cf(w1) + (1-lam) * cf(w2)/C
        ce = -(1/n_bigrams) * sum ln p

    the one-step-better KenLM stand-in over ``unigram_cross_entropy``
    (same filtering role as CCNet's perplexity: low ce = boilerplate
    made of the corpus's stock phrases, high ce = token soup whose
    bigrams never co-occur). Interpolation with the unigram model
    keeps every probability nonzero, so unseen bigrams need no
    back-off table. Docs with < 2 tokens get ce = 0.

    Scale shape: the bigram stream is the same explode cardinality as
    the token stream (one row per adjacent pair), aggregated
    map-side-combinably per doc and per gram; the model joins are
    keyed by gram/term exactly like the posting build's shuffles. No
    Python, no windows.
    """
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_ngrams(tokenize_for_scoring(F.col(text_col)), 2)).alias("g"),
    ).select(
        "doc_id",
        F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    tf2 = grams.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf2"))
    cf2 = tf2.groupBy("w1", "w2").agg(F.sum("tf2").alias("cf2"))
    from .bm25 import term_freqs  # noqa: PLC0415

    cf1 = (
        term_freqs(docs, id_col=id_col, text_col=text_col)
        .groupBy("term")
        .agg(F.sum("tf").alias("cf"))
    )
    total = cf1.agg(F.sum("cf").alias("c"))
    p = lam * F.col("cf2") / F.col("c1") + (1.0 - lam) * F.col("cw") / F.col("c")
    scored = (
        tf2.join(cf2, ["w1", "w2"])
        .join(cf1.select(F.col("term").alias("w1"), F.col("cf").alias("c1")), "w1")
        .join(cf1.select(F.col("term").alias("w2"), F.col("cf").alias("cw")), "w2")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf2").cast("long").alias("n_bigrams"),
            (-F.sum(F.col("tf2") * F.log(p)) / F.sum("tf2")).alias("ce"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(F.coalesce("ce", F.lit(0.0)), 6).alias("ce"),
        )
    )


def ccnet_perplexity_buckets(
    docs: DataFrame,
    lo: float = 1.0 / 3.0,
    hi: float = 2.0 / 3.0,
    lang_col: str = "lang",
    exact: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, lang, ce, bucket): the CCNet corpus split — docs
    bucketed head/middle/tail by LM cross-entropy percentile WITHIN
    their language, head = lowest ce (the best-scoring third under
    CCNet's convention; Wenzek et al. 2019 use KenLM perplexity, this
    engine's deterministic proxy is the corpus unigram LM of
    ``unigram_cross_entropy``). Thresholds are the per-language
    ``lo``/``hi`` quantiles (linear interpolation), rounded to 6
    places on BOTH the engine and oracle sides so bucket boundaries
    are fp-stable across engines.

    Scale shape: ce is two combinable aggs + a term-keyed join (see
    unigram_cross_entropy); the thresholds are one tiny per-language
    agg broadcast back. ``exact=True`` runs Spark's exact percentile
    (a per-language sort — fine up to ~10^8 rows/language); at the
    10^12-doc target set ``exact=False`` for the t-digest
    ``percentile_approx`` sketch (combinable, no sort) and accept
    approximate boundaries, which CCNet itself does."""
    ce = unigram_cross_entropy(docs, id_col=id_col, text_col=text_col)
    joined = ce.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")),
        "doc_id",
    )
    pcts = [float(lo), float(hi)]
    agg = (
        F.percentile("ce", pcts) if exact else F.percentile_approx("ce", pcts, 10000)
    )
    thr = joined.groupBy("lang").agg(
        F.round(F.element_at(agg, 1), 6).alias("p_lo"),
        F.round(F.element_at(agg, 2), 6).alias("p_hi"),
    )
    return joined.join(F.broadcast(thr), "lang").select(
        "doc_id",
        "lang",
        "ce",
        F.when(F.col("ce") <= F.col("p_lo"), F.lit("head"))
        .when(F.col("ce") <= F.col("p_hi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# the Gopher paper's stopword list (Rae et al. 2021, App. A1.1): a doc
# must contain at least min_stopwords DISTINCT of these
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, mean_word_len, alpha_frac, n_stopwords,
    pass_words, pass_word_len, pass_alpha, pass_stopwords, keep):
    the Gopher quality-filter rule family (Rae et al. 2021, Table A1)
    as explicit per-rule flags — word-count bounds, mean-word-length
    bounds, minimum fraction of words with an alphabetic character,
    and the distinct-stopword floor. ``keep`` is the conjunction.
    Rules the whitespace data model can't express (bullet/ellipsis
    line ratios need line structure; see repetition_signals for the
    duplicate-n-gram family) are deliberately absent rather than
    faked.

    Scale shape: one tokenize explode + one combinable agg per doc
    (counts, length sums, conditional counts) — the same single-pass
    shape as doc_stats; thresholds are codegen'd comparisons."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_for_scoring(F.col(text_col))).alias("term"),
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.avg(F.length("term")).alias("mean_word_len"),
        F.avg(
            F.when(F.col("term").rlike("[a-zA-Z]"), 1.0).otherwise(0.0)
        ).alias("alpha_frac"),
        F.size(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        F.col("term").isin(*GOPHER_STOPWORDS), F.col("term")
                    )
                )
            )
        ).alias("n_stopwords"),
    )
    pw = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    pl = (F.col("mean_word_len") >= min_mean_word_len) & (
        F.col("mean_word_len") <= max_mean_word_len
    )
    pa = F.col("alpha_frac") >= min_alpha_frac
    ps = F.col("n_stopwords") >= min_stopwords
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.round(F.coalesce("mean_word_len", F.lit(0.0)), 6).alias("mean_word_len"),
            F.round(F.coalesce("alpha_frac", F.lit(0.0)), 6).alias("alpha_frac"),
            F.coalesce("n_stopwords", F.lit(0)).alias("n_stopwords"),
            F.coalesce(pw, F.lit(False)).alias("pass_words"),
            F.coalesce(pl, F.lit(False)).alias("pass_word_len"),
            F.coalesce(pa, F.lit(False)).alias("pass_alpha"),
            F.coalesce(ps, F.lit(False)).alias("pass_stopwords"),
            F.coalesce(pw & pl & pa & ps, F.lit(False)).alias("keep"),
        )
    )


C4_BADWORD_DEFAULTS: tuple[str, ...] = ()


def c4_cleaning_rules(
    docs: DataFrame,
    min_words_per_line: int = 5,
    require_terminal_punct: bool = True,
    min_sentences: int = 3,
    badwords: tuple[str, ...] = C4_BADWORD_DEFAULTS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_lines, n_lines_kept, n_sentences, pass_sentences,
    pass_lorem, pass_brace, pass_badwords, keep, kept_text): the C4
    cleaning heuristics (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning...", section 2.2) as explicit per-rule flags —
    LINE rules (retain lines ending in terminal punctuation [. ! ? "]
    when ``require_terminal_punct``, with >= ``min_words_per_line``
    words, and not containing "javascript") and PAGE rules (>= 
    ``min_sentences`` sentences in the retained text, no "lorem
    ipsum", no curly brace, no word from ``badwords``). ``keep`` is
    the page-rule conjunction AND a non-empty retained text; the
    three-sentence-span dedup step of C4 is the separate corpus-level
    operator family (line_dedup / substring_dedup).

    Scale shape: every rule is a higher-order array expression over
    the line split (F.filter / F.exists — JVM codegen, no UDF, no
    explode): one narrow projection pass over the corpus, embarrassingly
    parallel, nothing shuffles."""
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(lines, lambda l: line_ok_expr(l, min_words_per_line, require_terminal_punct))
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        kept.alias("_kept"),
        F.lower(F.col(text_col)).alias("_low"),
    )
    kept_text = F.array_join(F.col("_kept"), "\n")
    n_sent = F.regexp_count(kept_text, F.lit(r"[.!?]"))
    # page-level removals act on the RAW page text (C4 removes any
    # page that CONTAINED the marker, whether or not the offending
    # line survives the line filter)
    low = F.col("_low")
    pass_sent = n_sent >= int(min_sentences)
    pass_lorem = ~low.contains("lorem ipsum")
    pass_brace = ~low.contains("{")
    if badwords:
        bw = F.lit(True)
        for w in badwords:
            bw = bw & ~F.array_contains(
                F.split(low, r"\s+"), w.lower()
            )
        pass_bad = bw
    else:
        pass_bad = F.lit(True)
    return out.select(
        "doc_id",
        "n_lines",
        F.size("_kept").alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        pass_sent.alias("pass_sentences"),
        pass_lorem.alias("pass_lorem"),
        pass_brace.alias("pass_brace"),
        pass_bad.alias("pass_badwords"),
        (
            pass_sent & pass_lorem & pass_brace & pass_bad
            & (F.size("_kept") > 0)
        ).alias("keep"),
        kept_text.alias("kept_text"),
    )


def line_ok_expr(l: Column, min_words_per_line: int, require_terminal_punct: bool) -> Column:
    """Per-line C4 retention predicate over a line column (used inside
    the F.filter lambda): non-blank, >= min words, no "javascript",
    optionally terminal-punctuated."""
    lt = F.trim(l)
    ok = (F.length(lt) > 0) & (
        F.size(F.split(lt, r"\s+")) >= int(min_words_per_line)
    ) & ~F.lower(l).contains("javascript")
    if require_terminal_punct:
        ok = ok & lt.rlike(r'[.!?"]$')
    return ok


def zipf_fit(docs: DataFrame, top_n: int = 64, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(n_terms, slope, intercept, r2): ordinary-least-squares fit of
    ln(collection tf) against ln(frequency rank) over the ``top_n``
    most frequent terms — the Zipf diagnostic every corpus-health
    report carries (a healthy natural-language crawl slope sits near
    -1; template/boilerplate-heavy shards flatten it, spam inflates
    the head). Rank ties break term-asc, so the fit is deterministic.

    Scale shape: one tokenize explode into ONE combinable (term)
    count agg — the df agg the index build already does — then the
    fit runs over top_n rows (a window top-n on the tiny term-count
    table followed by five scalar sums)."""
    toks = docs.select(
        F.explode(tokenize_for_scoring(F.col(text_col))).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("ctf"))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("ctf"), F.asc("term"))
    top = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    xy = top.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("ctf").cast("double")).alias("y"),
    )
    sums = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / denx
    return sums.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
        F.round((num * num) / (denx * deny), 6).alias("r2"),
    )
