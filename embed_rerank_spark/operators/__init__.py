"""Relational/domain operators: postings, BM25, WAND, rerank, dedup,
similarity, text statistics."""
