"""Corpus preparation: the dedup -> quality-filter -> extraction
pipeline a training-data / indexing run applies before anything else.

Composition of existing operators (each independently oracle-checked):

1. exact dedup    — one survivor per normalized-text group
2. near dedup     — MinHash-LSH pairs verified by shingle Jaccard;
                    the larger id of each pair is dropped
3. quality filter — language/length/punctuation scoring, keep rows
                    above a threshold
4. extraction     — byte-identical truncation semantics, errors
                    quarantined (counted, not fatal)

Scale notes: steps 1-3 are hash aggregations and bucket joins (no
cross joins anywhere); step 4 is an embarrassingly-parallel pandas-UDF
projection. The output is the `clean corpus` the index build consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import dedup_survivors, exact_dedup, minhash_lsh_dedup
from ..operators.textstats import quality_score


def prepare_corpus(
    docs: DataFrame,
    near_dup_threshold: float = 0.5,
    min_quality: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text, quality): deduplicated, quality-filtered corpus.

    Keeps exact-dedup survivors, drops the larger side of every
    verified near-dup pair, then filters on the quality score.
    """
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    exact_survivors = exact_dedup(base).select("doc_id")
    kept = base.join(exact_survivors, "doc_id", "left_semi")

    near_pairs = minhash_lsh_dedup(kept, threshold=near_dup_threshold)
    kept = dedup_survivors(kept, near_pairs)

    q = quality_score(kept)
    return (
        kept.join(q, "doc_id")
        .filter(F.col("quality") >= min_quality)
        .select("doc_id", "text", "quality")
    )
