"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units",
https://arxiv.org/abs/1508.07909) — the tokenizer-training step of
an LLM data pipeline, run where the data lives.

The classic algorithm never iterates over the corpus: it iterates
over the WORD-FREQUENCY table. That is exactly the Spark-first
decomposition —

1. ``word_counts``: one combinable hash aggregation over the token
   stream (the only corpus-sized job; its output is
   vocabulary-sized — tens of millions of rows at web scale, not
   trillions);
2. per merge step, over the vocab table only: explode adjacent
   symbol pairs weighted by word count -> one combinable agg ->
   a single-row argmax (count desc, pair asc — deterministic
   tie-break) collected to the driver;
3. apply the merge: only words CONTAINING the winning pair are
   rewritten (an ``exists`` prefilter keeps the rewrite load
   proportional to affected words), via an Arrow-batched pandas UDF
   doing the standard leftmost non-overlapping scan.

``n_merges`` driver-side iterations of vocabulary-sized jobs; the
symbol table is localCheckpoint-materialized every iteration — BPE
is inherently sequential in its merge table, and an unmaterialized
step would make iteration k recompute all k-1 prior merge stages
(measured: the lineage chain turns ~1 s/merge into minutes by merge
12). The
reference engine tokenizes with a pretrained model
(``app/backends/mlx_backend.py`` loads its tokenizer); training one
from scratch is the pipeline step upstream of everything this
engine scores, and has no reference analogue to copy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.udfs import tokenize_for_scoring

END_OF_WORD = "</w>"


def word_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, n): whitespace-token frequency over the corpus — the one
    corpus-sized job in BPE training (map-side combinable)."""
    return (
        docs.select(
            F.explode(tokenize_for_scoring(F.col(text_col))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, n, syms): each word as its character sequence plus the
    end-of-word marker (so merges can learn word-final units)."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != F.lit(""))
    return words.select(
        "word", "n", F.concat(chars, F.array(F.lit(END_OF_WORD))).alias("syms")
    )


def _pair_counts(symtab: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent symbol pairs weighted by word frequency —
    one explode + one combinable agg over the vocab table."""
    idx = F.sequence(F.lit(0), F.size("syms") - 2)
    pairs = symtab.filter(F.size("syms") >= 2).select(
        "n",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.get("syms", i).alias("a"),
                    F.get("syms", i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("n").alias("cnt")
    )


_MERGE_UDF = None


def _merge_pair_udf():
    """Leftmost non-overlapping merge of the (a, b) pair inside each
    symbol sequence — the textbook BPE apply step, Arrow-batched over
    the (prefiltered) affected words only. Built lazily (pandas_udf
    type parsing needs an active session) and cached."""
    global _MERGE_UDF
    if _MERGE_UDF is None:

        @pandas_udf("array<string>")
        def merge(syms: pd.Series, a: pd.Series, b: pd.Series) -> pd.Series:
            out = []
            for seq, pa, pb in zip(syms, a, b):
                merged = []
                i, m = 0, len(seq)
                while i < m:
                    if i + 1 < m and seq[i] == pa and seq[i + 1] == pb:
                        merged.append(pa + pb)
                        i += 2
                    else:
                        merged.append(seq[i])
                        i += 1
                out.append(merged)
            return pd.Series(out)

        _MERGE_UDF = merge
    return _MERGE_UDF


def bpe_train_reference(
    texts: list[str], n_merges: int, min_pair_count: int = 2
) -> tuple[list[tuple[str, str, int]], dict[str, tuple[str, ...]]]:
    """Pure-Python single-machine Sennrich reference for ``bpe_train``
    (same tokenization, same count-desc/pair-asc tie rule, leftmost
    non-overlapping merge).  Exists so the distributed path can be
    VALUE-checked against an independently-executed implementation:
    tests pin exact parity, and the ``bpe_merges`` contract entry
    materializes this reference's merge table to ``.oracle_aux`` for
    the DuckDB oracle.  Driver-sized input only — the distributed
    trainer is the scale path."""
    from collections import Counter  # noqa: PLC0415

    words = Counter(w for t in texts for w in t.strip().lower().split())
    symtab = {w: tuple(list(w) + [END_OF_WORD]) for w in words}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, n in words.items():
            seq = symtab[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        for w in symtab:
            seq, out, i = symtab[w], [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            symtab[w] = tuple(out)
    return merges, symtab


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    min_pair_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus.

    Returns ``(merges, symtab)``: the ordered merge table as
    (a, b, pair_count) with the deterministic tie rule (count desc,
    a asc, b asc), and the final (word, n, syms) segmentation table.
    Stops early when no pair reaches ``min_pair_count`` (merging
    singletons memorizes noise; Sennrich stops at frequency 2).
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    symtab = _initial_symbols(word_counts(docs, id_col, text_col))
    symtab = symtab.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(symtab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        has_pair = F.exists(
            F.sequence(F.lit(0), F.size("syms") - 2),
            lambda i: (F.get("syms", i) == F.lit(a))
            & (F.get("syms", i + 1) == F.lit(b)),
        )
        symtab = symtab.withColumn(
            "syms",
            F.when(
                F.size("syms") >= 2,
                F.when(
                    has_pair, _merge_pair_udf()("syms", F.lit(a), F.lit(b))
                ).otherwise(F.col("syms")),
            ).otherwise(F.col("syms")),
        ).localCheckpoint(eager=True)
    return merges, symtab


def bpe_segment(symtab: DataFrame) -> DataFrame:
    """(word, n, subwords): final segmentation view of a training run
    — ``syms`` renamed for downstream vocab building."""
    return symtab.select("word", "n", F.col("syms").alias("subwords"))


def bpe_vocab(symtab: DataFrame, top_n: int | None = None) -> DataFrame:
    """(token, n_words, total): the learned subword vocabulary —
    distinct symbols with the number of words using them and their
    corpus-weighted occurrence count; ordered total desc, token asc
    (one explode + one combinable agg over the vocab table)."""
    out = (
        symtab.select("n", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n").alias("total"),
        )
        .orderBy(F.desc("total"), F.asc("token"))
    )
    return out.limit(top_n) if top_n else out


_ENCODE_UDF_CACHE: dict[tuple[tuple[str, str], ...], object] = {}


def _encode_udf(merges: list[tuple[str, str]]):
    """(word) -> subword array: apply the trained merge table to one
    word — merges applied IN TABLE ORDER, each as a leftmost
    non-overlapping scan (identical to the training-side apply step,
    so encode(train_corpus) reproduces the final training symtab).
    Arrow-batched; the merge table rides in the serialized closure
    (merge tables are small — 32k pairs ~ 1 MB; for larger tables
    broadcast a dict and reference it here). Cached per merge table so
    repeated plans reuse one UDF object."""
    key = tuple((a, b) for a, b in merges)
    if key not in _ENCODE_UDF_CACHE:
        table = list(key)

        @pandas_udf("array<string>")
        def encode(words: pd.Series) -> pd.Series:
            out = []
            for word in words:
                syms = list(word)
                syms.append(END_OF_WORD)
                present = set(syms)
                for a, b in table:
                    if len(syms) < 2 or a not in present or b not in present:
                        continue
                    merged = []
                    i, m = 0, len(syms)
                    while i < m:
                        if i + 1 < m and syms[i] == a and syms[i + 1] == b:
                            merged.append(a + b)
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    if len(merged) < len(syms):
                        syms = merged
                        present = set(syms)
                out.append(syms)
            return pd.Series(out)

        _ENCODE_UDF_CACHE[key] = encode
    return _ENCODE_UDF_CACHE[key]


def bpe_word_map(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(word, n, subwords): every DISTINCT corpus word encoded with the
    merge table, plus its corpus frequency. The central scale trick of
    BPE encoding on Spark: the corpus is tokenized once (combinable
    word-count agg), and the Python encode loop runs over the
    VOCABULARY — tens of millions of rows at web scale — never over
    the trillions of word occurrences; occurrences get their tokens
    back via a join on ``word``."""
    return word_counts(docs, id_col, text_col).withColumn(
        "subwords", _encode_udf(merges)(F.col("word"))
    )


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, tokens): each document encoded to its BPE
    token sequence — the tokenization step every LLM training pipeline
    runs over its full corpus (and the input to token-budget data
    selection, sequence packing, and context-length stats).

    Scale shape: tokenize -> posexplode is the corpus-sized map; the
    word -> subwords segmentation joins in from the vocabulary-sized
    ``bpe_word_map`` (Catalyst broadcasts it when it fits, which a
    32k-merge tokenizer's closure over a web vocab usually does not —
    then it is the one shuffle join, same shape as the scorer's dl
    join); per-doc reassembly is one combinable collect_list keyed by
    doc_id, sorted by word position and flattened JVM-side."""
    wmap = bpe_word_map(docs, merges, id_col, text_col).select("word", "subwords")
    occs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize_for_scoring(F.col(text_col))).alias("pos", "word"),
    )
    return (
        occs.join(wmap, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "subwords"))
                    ),
                    lambda s: s["subwords"],
                )
            ).alias("tokens")
        )
        .select("doc_id", F.size("tokens").alias("n_tokens"), "tokens")
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, n_words, total): corpus token statistics under the
    trained tokenizer — ``total`` is the corpus-weighted occurrence
    count (what token-budget selection needs), ``n_words`` the number
    of distinct words the token appears in. One explode + one
    combinable agg over the vocabulary-sized word map; never touches
    doc rows."""
    wm = bpe_word_map(docs, merges, id_col, text_col)
    return (
        wm.select("word", "n", F.explode("subwords").alias("token"))
        .groupBy("token")
        .agg(
            F.count_distinct("word").alias("n_words"),
            F.sum("n").alias("total"),
        )
    )
