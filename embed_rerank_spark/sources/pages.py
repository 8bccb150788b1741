"""Deterministic synthetic ``pages`` corpus.

Schema per BASELINE.json input_hint: (url:string, warc_ts:timestamp,
html:binary, text:string, lang:string). Properties engineered for the
engine's test/bench needs (FIXTURES.md §1):

- Zipf-ish vocabulary (word rank ~ V^u inverse-CDF) over ``w0..w{V-1}``
  plus a handful of hot terms present in nearly every doc (skew path)
  and rare terms (selective-query path)
- ~8% of docs exceed the 8192-char (2048-token) truncation threshold so
  every TextSummarizer strategy branch executes in the extract stage
- ``warc_ts`` spans ``n_snapshots`` distinct days — the unit of
  incremental/snapshot builds and of checkpoint resume
- fully deterministic in (seed, doc index): content depends only on the
  row's doc index, never on partitioning, so any subset/reordering of
  the build reproduces byte-identical texts per url

Generation runs distributed (``spark.range`` -> ``mapInArrow``); the
per-row RNG is a counter-based Philox keyed by (seed, doc index), so
there is no driver-side data and no cross-partition coupling.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

HOT_TERMS = ["the", "a", "of", "data"]
RARE_TERMS = ["zyzzyva", "quokka", "xenolith"]
LANGS = ["en", "en", "en", "en", "en", "en", "en", "de", "es", "zh"]
BASE_DAY = dt.datetime(2025, 6, 1)


def _gen_batch(
    ids: np.ndarray, seed: int, vocab_size: int, n_snapshots: int
) -> dict[str, list]:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_idx in ids:
        rng = np.random.Generator(np.random.Philox(key=[seed, int(doc_idx)]))
        # 8% long docs (> 8192 chars), rest short-to-medium
        n_words = int(rng.integers(2200, 3800)) if rng.random() < 0.08 else int(
            rng.integers(40, 400)
        )
        u = rng.random(n_words)
        ranks = np.minimum(
            (vocab_size ** u).astype(np.int64), vocab_size - 1
        )  # zipf-ish: rank r frequency ~ 1/r
        words = [f"w{r}" for r in ranks]
        # hot terms sprinkled into ~every doc; rare terms in ~0.3%
        for h in HOT_TERMS:
            if rng.random() < 0.95:
                pos = int(rng.integers(0, len(words)))
                words[pos] = h
        if rng.random() < 0.003:
            words[int(rng.integers(0, len(words)))] = RARE_TERMS[
                int(rng.integers(0, len(RARE_TERMS)))
            ]
        # sentence structure: period every 6-14 words
        out = []
        i = 0
        while i < len(words):
            step = int(rng.integers(6, 15))
            out.append(" ".join(words[i : i + step]) + ".")
            i += step
        text = " ".join(out)

        snap = int(doc_idx) % n_snapshots
        urls.append(f"https://example.org/p/{int(doc_idx):012d}")
        tss.append(BASE_DAY + dt.timedelta(days=snap, seconds=int(doc_idx) % 86400))
        htmls.append(b"<html><body>" + text.encode("utf-8") + b"</body></html>")
        texts.append(text)
        langs.append(LANGS[int(doc_idx) % len(LANGS)])
    return {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}


def generate_pages(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    vocab_size: int = 10_000,
    n_snapshots: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    parts = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pa.RecordBatch]):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            yield pa.RecordBatch.from_pydict(_gen_batch(ids, seed, vocab_size, n_snapshots))

    return spark.range(0, n_docs, numPartitions=parts).mapInArrow(gen, PAGES_SCHEMA)
