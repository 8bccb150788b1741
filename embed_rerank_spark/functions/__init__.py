"""Deterministic scalar semantics: text extraction, tokenization, scoring."""
