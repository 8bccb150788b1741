"""Vectorized pandas UDFs over the deterministic text kernels.

The string kernels live in ``text_processing.py`` (pure Python, also
the pytest oracle); here they are lifted to Arrow-batched pandas UDFs
— the only Python execution surface of the extraction stage. There is
deliberately no row-at-a-time ``F.udf`` anywhere in the engine
(BASELINE.json input_hint: "no per-row Python").

Tokenization for scoring stays entirely JVM-side
(``tokenize_for_scoring``): ``F.split(F.lower(...))`` — the Spark
mapping of the reference whitespace tokenizer
(``app/backends/mlx_backend.py:315-342``) with the lowercase
convention of its Jaccard scorer (``mlx_backend.py:687-702``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from . import text_processing as tp

EXTRACT_RESULT_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("original_tokens", IntegerType()),
        StructField("processed_tokens", IntegerType()),
        StructField("truncated", BooleanType()),
        StructField("strategy_used", StringType()),
        StructField("error", StringType()),
    ]
)


def make_extract_udf(
    max_tokens: int = 2048,
    absolute_max_tokens: int = 8192,
    strategy: str = "smart_truncate",
    auto_truncate: bool = True,
):
    """Pandas UDF: raw page text -> struct(text, stats, error).

    Errors (empty text, over absolute limit, strategy="error") do not
    raise — at table scale a bad row must quarantine, not kill the job
    — they land in the ``error`` field and the caller filters them
    into a quarantine DataFrame (Spark-side replacement for the
    reference's raise-on-first-error loop, ``text_utils.py:247-299``).
    """

    @pandas_udf(EXTRACT_RESULT_SCHEMA)
    def extract(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            if t is None:
                rows.append((None, 0, 0, False, "none", "null text"))
                continue
            try:
                processed, info = tp.process_text_with_options(
                    t, max_tokens, absolute_max_tokens, strategy, auto_truncate
                )
                rows.append(
                    (
                        processed,
                        info.original_tokens,
                        info.processed_tokens,
                        info.truncated,
                        info.strategy_used,
                        None,
                    )
                )
            except ValueError as e:
                rows.append((None, tp.estimate_tokens(t), 0, False, strategy, str(e)))
        return pd.DataFrame(
            rows,
            columns=[
                "text",
                "original_tokens",
                "processed_tokens",
                "truncated",
                "strategy_used",
                "error",
            ],
        )

    return extract


def tokenize_for_scoring(col: Column) -> Column:
    """Whitespace tokens, lowercased, empties removed — pure JVM-side.

    Matches ``text.strip().split()`` + ``.lower()`` (reference
    ``mlx_backend.py:331,694``): Python ``str.split()`` with no
    argument splits on runs of arbitrary whitespace and drops
    leading/trailing empties, which is exactly
    ``split(trim(lower(col)), '\\s+')`` with empty strings filtered.
    """
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def tokenize_preserve_case(col: Column) -> Column:
    """``text.strip().split()`` without lowercasing (reference pair
    tokenizer, ``mlx_reranker_backend.py:205-223``)."""
    toks = F.split(F.trim(col), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def analyze_stop(
    docs,
    stopwords: tuple[str, ...] = STOPWORDS_EN,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, text): the corpus passed through a stop-token analyzer
    (Lucene StopFilter / the ES ``stop`` analyzer) — tokens in
    ``stopwords`` are dropped from the token stream BEFORE indexing,
    so document lengths, df, and avgdl all reflect the analyzed
    stream (stopword removal is an index-time decision in Lucene for
    exactly this reason: it changes the norms, not just the matches).

    Pure JVM projection (split -> filter -> re-join); composes with
    the unchanged build/WAND/brute machinery the way the BM25F
    weighted stream does. Query strings must pass through
    ``analyze_query_stop`` so both sides see the same analyzer — the
    analyzer contract every Lucene-lineage engine enforces.
    """
    toks = tokenize_for_scoring(F.col(text_col))
    kept = F.filter(toks, lambda t: ~t.isin(*stopwords))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.array_join(kept, " ").alias("text")
    )


def analyze_query_stop(
    queries: list[tuple[int, str]],
    stopwords: tuple[str, ...] = STOPWORDS_EN,
) -> list[tuple[int, str]]:
    """Query-side of the stop analyzer: same token filter, applied to
    the (tiny, driver-held) query strings. A query that is ALL
    stopwords analyzes to the empty string and matches nothing — the
    standard Lucene outcome."""
    out = []
    for qid, q in queries:
        kept = [t for t in q.strip().lower().split() if t not in stopwords]
        out.append((qid, " ".join(kept)))
    return out


def _s_stem_token(t):
    """Column-level Harman (1991) s-stemmer: the three-rule English
    plural stripper (''ies''->''y'' unless e/a-preceded; ''es''->''e''
    unless a/e/o-preceded; ''-s'' dropped unless ''us''/''ss'').
    Weaker than Porter by design — every rule is a pure string
    expression both Spark codegen and the DuckDB oracle evaluate
    identically, which a full Porter stemmer's measure() loop is not."""
    return (
        F.when(
            t.endswith("ies")
            & ~t.endswith("eies")
            & ~t.endswith("aies"),
            F.concat(F.substring(t, 1, F.length(t) - 3), F.lit("y")),
        )
        .when(
            t.endswith("es")
            & ~t.endswith("aes")
            & ~t.endswith("ees")
            & ~t.endswith("oes"),
            F.substring(t, 1, F.length(t) - 1),
        )
        .when(
            t.endswith("s") & ~t.endswith("us") & ~t.endswith("ss"),
            F.substring(t, 1, F.length(t) - 1),
        )
        .otherwise(t)
    )


def analyze_s_stem(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, text): the corpus through an s-stemming analyzer
    (Lucene EnglishMinimalStemFilter lineage) — plural forms collapse
    onto their singular so ``table`` matches ``tables`` and df/dl/
    avgdl reflect the stemmed stream. Pure JVM projection; pair with
    ``analyze_query_s_stem`` (the Lucene same-analyzer contract)."""
    toks = tokenize_for_scoring(F.col(text_col))
    stemmed = F.transform(toks, _s_stem_token)
    return docs.select(
        F.col(id_col).alias("doc_id"), F.array_join(stemmed, " ").alias("text")
    )


def _s_stem_py(t: str) -> str:
    if t.endswith("ies") and not (t.endswith("eies") or t.endswith("aies")):
        return t[:-3] + "y"
    if t.endswith("es") and not (
        t.endswith("aes") or t.endswith("ees") or t.endswith("oes")
    ):
        return t[:-1]
    if t.endswith("s") and not (t.endswith("us") or t.endswith("ss")):
        return t[:-1]
    return t


def analyze_query_s_stem(queries: list[tuple[int, str]]) -> list[tuple[int, str]]:
    """Query-side of the s-stemmer: same rules on the driver-held
    query strings."""
    return [
        (qid, " ".join(_s_stem_py(t) for t in q.strip().lower().split()))
        for qid, q in queries
    ]
