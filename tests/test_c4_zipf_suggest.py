"""C4 cleaning rules (full line/sentence semantics on structured
fixtures), Zipf OLS diagnostic vs numpy, and the context-filtered
completion suggester."""

from __future__ import annotations

import math
import sys
from collections import Counter
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.rewrite import context_suggest  # noqa: E402
from embed_rerank_spark.operators.textstats import (  # noqa: E402
    c4_cleaning_rules,
    zipf_fit,
)


def test_c4_line_rules(spark):
    docs = spark.createDataFrame(
        [
            # line 1 kept; line 2 dropped (no terminal punct); line 3
            # dropped (short); line 4 dropped (javascript)
            (1, "this page has five good words.\n"
                "no terminal punctuation here\n"
                "too short.\n"
                "please enable javascript to continue viewing this."),
            # all lines kept, three sentences
            (2, "one full sentence with enough words here.\n"
                "another full sentence with enough words too!\n"
                "is this a third sentence with enough words?"),
            # page killed by lorem ipsum
            (3, "lorem ipsum dolor sit amet consectetur adipiscing elit."),
            # page killed by curly brace
            (4, "function foo() { return the usual code block sample. }"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in c4_cleaning_rules(docs, min_sentences=2).collect()}
    r1 = got[1]
    assert r1["n_lines"] == 4 and r1["n_lines_kept"] == 1
    assert r1["kept_text"] == "this page has five good words."
    assert r1["n_sentences"] == 1 and not r1["pass_sentences"] and not r1["keep"]
    r2 = got[2]
    assert r2["n_lines_kept"] == 3 and r2["n_sentences"] == 3
    assert r2["keep"] and r2["pass_lorem"] and r2["pass_brace"]
    assert not got[3]["pass_lorem"] and not got[3]["keep"]
    assert not got[4]["pass_brace"] and not got[4]["keep"]


def test_c4_badwords_and_relaxed_punct(spark):
    docs = spark.createDataFrame(
        [(1, "clean words all the way through here"),
         (2, "contains the forbidden word spark in the middle")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in c4_cleaning_rules(
            docs, min_words_per_line=5, require_terminal_punct=False,
            min_sentences=0, badwords=("spark",),
        ).collect()
    }
    assert got[1]["keep"] and got[1]["pass_badwords"]
    assert not got[2]["pass_badwords"] and not got[2]["keep"]


def test_zipf_fit_matches_numpy(spark):
    words = (["the"] * 40 + ["of"] * 20 + ["and"] * 13 + ["to"] * 10
             + ["a"] * 8 + ["in"] * 6)
    docs = spark.createDataFrame(
        [(1, " ".join(words[:50])), (2, " ".join(words[50:]))],
        "doc_id long, text string",
    )
    r = zipf_fit(docs, top_n=6).collect()[0]
    counts = Counter(words)
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:6]
    x = np.log(np.arange(1, len(ordered) + 1, dtype=float))
    y = np.log(np.array([c for _, c in ordered], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    corr = np.corrcoef(x, y)[0, 1]
    assert r["n_terms"] == 6
    assert r["slope"] == pytest.approx(slope, abs=1e-6)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-6)
    assert r["r2"] == pytest.approx(corr * corr, abs=1e-6)
    # a Zipfian head fits a negative slope tightly
    assert r["slope"] < 0 and r["r2"] > 0.95


def test_context_suggest_filters_by_context(spark):
    docs = spark.createDataFrame(
        [
            (1, "scan scan sort", "en"),
            (2, "scan merge", "en"),
            (3, "span sort", "de"),
            (4, "scan span", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    reqs = [(1, "s", "en"), (2, "s", "de"), (3, "zz", "en")]
    got = {}
    for r in context_suggest(spark, docs, reqs, top=3).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["term"], r["df"]))
    # en: scan df=2, merge/sort don't start with s except sort df=1
    assert got[1] == [(1, "scan", 2), (2, "sort", 1)]
    # de: span df=2, scan df=1, sort df=1 -> span first, then alpha
    assert got[2] == [(1, "span", 2), (2, "scan", 1), (3, "sort", 1)]
    assert 3 not in got  # no-match prefix yields nothing
