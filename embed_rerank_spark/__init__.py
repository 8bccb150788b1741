"""embed_rerank_spark — a PySpark-native retrieve-and-rerank engine.

A from-scratch inverted-index build + BM25 first-stage retriever
(block-max WAND over delta+varbyte-compressed, term-partitioned
posting lists) followed by a deterministic vectorized rerank pass,
re-expressing the query semantics of the reference serving loop
(joonsoome/embed-rerank) as pure batch PySpark DataFrame pipelines.

Layout:
- ``functions/``  deterministic scalar semantics (text extraction,
  tokenization, scoring heads) as plain Python oracles + pandas UDFs
- ``operators/``  relational/domain operators (postings, BM25, WAND,
  rerank, dedup, similarity, text stats)
- ``sources/``    pages-table adapters (parquet/Iceberg) + synthetic
  deterministic ``pages`` corpus and query set
- ``plans/``      end-to-end jobs (snapshot-incremental index build +
  merge with checkpoint/lineage manifests, corpus preparation)

Streaming operators live in ``operators/events.py`` (tumbling/session
windows run unchanged over ``readStream``; custom stateful
sessionization via ``applyInPandasWithState``); the index itself is
batch-incremental over snapshot ranges — the reference has no
streaming semantics to reproduce.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
