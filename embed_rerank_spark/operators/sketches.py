"""Streaming-sketch operators: Misra-Gries heavy hitters over the
corpus token stream.

The exact per-term count table (``term_freqs`` -> groupBy) is the
precise answer but shuffles the full vocabulary; a crawl-curation loop
that only wants "the few thousand terms dominating the token budget"
(stopword mining, boilerplate-token discovery, tokenizer-vocab seeding)
can take a bounded-memory sketch instead. Misra-Gries is the classic
deterministic one: capacity k, guaranteed to contain every term with
frequency > N/k, each reported count an UNDER-estimate by at most the
total decrement weight.

Reference parity note: the reference (joonsoome/embed-rerank) has no
corpus analytics; this extends the engine's pipeline surface
(SURVEY.md §2 pipeline extensions).

Scale shape (100 TB):
- One pass over the token stream, per-partition sketches of <= k
  counters built inside ``mapInPandas`` — per-BATCH vectorized
  (pandas ``value_counts`` + merge of unique-term Series, never a
  per-token Python loop), memory bounded by k per task.
- Sketches are mergeable (Agarwal et al. 2012, "Mergeable summaries"):
  summing counters then subtracting the (k+1)-th largest keeps the MG
  guarantee. The merge here is one tiny groupBy over <= k rows per
  partition — combinable, no hot key.
- Exactness escape hatch: with capacity >= the partition's distinct
  term count no decrement ever fires, every count is exact and
  ``err_ub`` is 0 — which is what the DuckDB oracle pins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import tokenize_for_scoring

# sentinel term for per-partition decrement-total rows ('' can never be
# a token: the tokenizer drops empties)
_DECR_KEY = ""


def _mg_partition(batches: Iterator[pd.DataFrame], capacity: int) -> Iterator[pd.DataFrame]:
    """One Misra-Gries sketch over this partition's token stream.

    Per batch: ``value_counts`` (vectorized) then a Series add on the
    unique terms only. When the sketch exceeds ``capacity``, subtract
    the (capacity+1)-th largest counter from everything and drop the
    non-positive rows — the mergeable-summaries reduction, equivalent
    to a run of classic MG decrements and carrying the same guarantee:
    true_count - counter <= total subtracted."""
    sketch = pd.Series(dtype="int64")
    decr = 0
    for pdf in batches:
        counts = pdf["term"].value_counts()
        sketch = sketch.add(counts, fill_value=0).astype("int64")
        if len(sketch) > capacity:
            kth = int(sketch.nlargest(capacity + 1).iloc[-1])
            decr += kth
            sketch = sketch - kth
            sketch = sketch[sketch > 0]
    out = sketch.rename_axis("term").reset_index(name="cnt")
    out["term"] = out["term"].astype(str)
    if decr:
        out = pd.concat(
            [out, pd.DataFrame({"term": [_DECR_KEY], "cnt": [decr]})],
            ignore_index=True,
        )
    yield out


def heavy_hitters(
    docs: DataFrame,
    capacity: int = 4096,
    top_n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(rank, term, count_lb, err_ub): the ``top_n`` heaviest corpus
    terms by Misra-Gries sketch count, engine tie semantics (count
    desc, term asc).

    ``count_lb`` is the summed sketch count — a lower bound on the true
    frequency; ``err_ub`` (same for every row) is the summed decrement
    weight across partitions — the maximum under-count, and the bound
    below which terms may be missing entirely. With ``capacity`` >=
    the distinct-term count the sketch is exact: counts equal the true
    frequencies and ``err_ub`` = 0.
    """
    toks = docs.select(
        F.explode(tokenize_for_scoring(F.col(text_col))).alias("term")
    )
    sketches = toks.mapInPandas(
        lambda it: _mg_partition(it, capacity), schema="term string, cnt long"
    )
    merged = sketches.groupBy("term").agg(F.sum("cnt").alias("cnt"))
    err = merged.filter(F.col("term") == _DECR_KEY).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("err_ub")
    )
    hitters = (
        merged.filter(F.col("term") != _DECR_KEY)
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(top_n)
    )
    w = F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("term")))
    return hitters.crossJoin(F.broadcast(err)).select(
        w.alias("rank"),
        "term",
        F.col("cnt").alias("count_lb"),
        "err_ub",
    )
