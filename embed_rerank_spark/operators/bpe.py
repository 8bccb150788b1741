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
