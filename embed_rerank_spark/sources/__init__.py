"""Synthetic deterministic sources: the Common-Crawl-style ``pages``
table (BASELINE.json input_hint) and derived query sets."""
