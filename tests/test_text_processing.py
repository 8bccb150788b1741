"""Byte-identity tests for the extraction semantics.

Two layers:
1. Self-contained behavioral tests (always run) pinning every branch.
2. A parity sweep against the reference ``TextSummarizer`` imported
   read-only from /root/reference (skipped when absent) — this is the
   byte-identical per-url invariant from BASELINE.json.
"""

from __future__ import annotations

import importlib.util
import random
import string
import sys

import pytest

from embed_rerank_spark.functions import text_processing as tp

REFERENCE_TEXT_UTILS = "/root/reference/app/utils/text_utils.py"


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_text_utils", REFERENCE_TEXT_UTILS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_text_utils"] = mod
    spec.loader.exec_module(mod)
    return mod


try:
    _ref = _load_reference()
    HAVE_REF = True
except Exception:
    _ref = None
    HAVE_REF = False


# ---------- layer 1: behavioral pins ----------


def test_truncate_under_limit_passthrough():
    assert tp.truncate_by_tokens("short text", 512) == "short text"


def test_truncate_cuts_at_char_budget_with_ellipsis():
    text = "a" * 100  # no spaces -> no boundary backoff
    out = tp.truncate_by_tokens(text, 10)  # 40 chars
    assert out == "a" * 40 + "..."


def test_truncate_backs_off_to_space_only_past_80pct():
    # space at position 35 of a 40-char budget (>32=80%) -> backoff
    text = "b" * 35 + " " + "c" * 30
    assert tp.truncate_by_tokens(text, 10) == "b" * 35 + "..."
    # space at position 10 (<32) -> hard cut, no backoff
    text2 = "b" * 10 + " " + "c" * 60
    assert tp.truncate_by_tokens(text2, 10) == ("b" * 10 + " " + "c" * 29) + "..."


def test_extract_returns_original_when_few_sentences():
    text = "One. Two. Three."
    assert tp.extract_key_sentences(text, 3) == text


def test_extract_selects_first_plus_middle():
    text = "S0. S1. S2. S3. S4. S5. S6. S7. S8."
    # 9 sentences, mid_start=3 -> [S0, S3, S4]
    assert tp.extract_key_sentences(text, 3) == "S0. S3. S4."


def test_smart_truncate_keeps_whole_sentences():
    text = ("Alpha beta gamma. " * 30).strip()  # 17-char sentences
    out = tp.smart_truncate(text, 20)  # 80-char budget
    assert out.endswith("Alpha beta gamma.")
    assert len(out) <= 80 + 2


def test_smart_truncate_falls_back_when_no_sentence_fits():
    text = "x" * 500  # one giant "sentence"
    assert tp.smart_truncate(text, 10) == tp.truncate_by_tokens(text, 10)


def test_validate_error_strategy_raises():
    with pytest.raises(ValueError):
        tp.validate_and_process_text("word " * 200, 10, "error")
    with pytest.raises(ValueError):
        tp.validate_and_process_text("   ", 10)


def test_process_absolute_limit_raises():
    with pytest.raises(ValueError, match="absolute maximum"):
        tp.process_text_with_options("w" * 100, max_tokens=10, absolute_max_tokens=20)


def test_process_no_autotruncate_raises():
    with pytest.raises(ValueError, match="recommended token limit"):
        tp.process_text_with_options(
            "w" * 100, max_tokens=10, absolute_max_tokens=1000, auto_truncate=False
        )


def test_process_passthrough_is_unstripped():
    text = "  hello world  "
    out, info = tp.process_text_with_options(text, 100, 1000)
    assert out == text  # under-limit texts are NOT stripped
    assert not info.truncated


# ---------- layer 2: reference parity sweep ----------


def _corpus(n: int = 400) -> list[str]:
    rng = random.Random(1234)
    words = ["alpha", "beta", "gamma", "delta", "order", "key", "scan", "the", "a"]
    texts = []
    for i in range(n):
        n_sent = rng.randint(1, 40)
        sents = []
        for _ in range(n_sent):
            n_words = rng.randint(1, 25)
            sent = " ".join(rng.choice(words) for _ in range(n_words))
            sents.append(sent + rng.choice([".", "!", "?", "...", ".."]))
        sep = rng.choice([" ", "  ", "\n"])
        t = sep.join(sents)
        if rng.random() < 0.2:
            t = " " * rng.randint(1, 3) + t + " " * rng.randint(1, 3)
        if rng.random() < 0.1:
            t += "".join(rng.choice(string.punctuation) for _ in range(5))
        texts.append(t)
    # adversarial edge cases around the 4*max_tokens boundaries
    for base in (39, 40, 41, 2047, 2048, 2049, 8191, 8192, 8193):
        texts.append("q" * base)
        texts.append(("w " * (base // 2))[:base])
    return texts


@pytest.mark.skipif(not HAVE_REF, reason="reference tree not available")
class TestReferenceParity:
    def test_truncate_by_tokens_parity(self):
        for t in _corpus():
            for mt in (10, 512, 2048):
                assert tp.truncate_by_tokens(t, mt) == _ref.TextSummarizer.truncate_by_tokens(
                    t, mt
                ), (t[:80], mt)

    def test_extract_key_sentences_parity(self):
        for t in _corpus():
            for ms in (1, 3, 20):
                assert tp.extract_key_sentences(
                    t, ms
                ) == _ref.TextSummarizer.extract_key_sentences(t, ms)

    def test_smart_truncate_parity(self):
        for t in _corpus():
            for mt in (10, 100, 512):
                assert tp.smart_truncate(t, mt) == _ref.TextSummarizer.smart_truncate(t, mt)

    def test_validate_and_process_parity(self):
        for t in _corpus():
            if not t.strip():
                continue
            for strat in ("smart_truncate", "truncate", "extract"):
                ours, info = tp.validate_and_process_text(t, 50, strat)
                theirs, ref_info = _ref.TextSummarizer.validate_and_process_text(
                    t, 50, strat, return_processing_info=True
                )
                assert ours == theirs
                assert info.processed_tokens == ref_info.processed_tokens
                assert info.truncated == ref_info.truncated
                assert info.warnings == ref_info.warnings

    def test_process_with_options_parity(self):
        texts = [t for t in _corpus(100) if t.strip()]
        ref_out, ref_infos = _ref.TextSummarizer.process_texts_with_options(
            texts, 50, 100000, "smart_truncate", True, return_processing_info=True
        )
        for t, r_text, r_info in zip(texts, ref_out, ref_infos):
            ours, info = tp.process_text_with_options(t, 50, 100000, "smart_truncate", True)
            assert ours == r_text
            assert info.truncated == r_info.truncated
            assert info.processed_tokens == r_info.processed_tokens
