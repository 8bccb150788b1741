"""Deterministic text extraction/truncation semantics (the byte-identical
per-url invariant).

These plain-Python functions ARE the engine's extraction semantics,
written from scratch to match the observable behavior of the reference
``TextSummarizer`` (joonsoome/embed-rerank,
``app/utils/text_utils.py:52-301``). Every branch below is pinned by a
unit test that, when the reference tree is present, compares against
the reference implementation directly (parity suite in
``tests/test_text_processing.py``).

Semantics summary (1 token ~= 4 chars everywhere):

- ``truncate_by_tokens`` — hard cut at ``max_tokens*4`` chars, back off
  to the last space only when that space sits past 80% of the budget,
  then append ``"..."`` (reference ``text_utils.py:52-75``).
- ``extract_key_sentences`` — split on ``[.!?]+``; if the text has at
  most ``max_sentences`` non-blank sentences return the ORIGINAL text
  verbatim; else keep the first sentence plus ``max_sentences-1``
  sentences starting at ``len(sentences)//3``, joined with ``". "`` and
  a trailing ``"."`` (reference ``text_utils.py:77-100``).
- ``smart_truncate`` — greedily accumulate whole stripped sentences
  while ``chars + len(sentence) + 2 <= max_tokens*4``; if nothing fits,
  fall back to ``truncate_by_tokens``; result is ``strip()``-ed
  (reference ``text_utils.py:102-141``).
- ``validate_and_process_text`` — strip; token estimate ``len//4``;
  pass-through when under the limit; otherwise dispatch per strategy
  (``truncate`` → T1, ``extract`` → T2 with
  ``max_sentences = max(1, max_tokens//100)``, ``error`` → raise,
  default → T3) (reference ``text_utils.py:143-217``).
- ``process_texts_with_options`` — batch wrapper; the UN-stripped
  length drives the absolute/recommended checks, and under-limit texts
  pass through UN-stripped (reference ``text_utils.py:219-301``).

The whole module is pure string code — no Spark imports — so the same
functions serve as (a) the pytest oracle and (b) the kernel inside the
vectorized pandas UDFs in ``functions/udfs.py``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_SENTENCE_SPLIT = re.compile(r"[.!?]+")

CHARS_PER_TOKEN = 4


@dataclass
class ProcessingInfo:
    """Per-text processing stats (reference ``TextProcessingResult``,
    ``app/utils/text_utils.py:16-42``)."""

    original_tokens: int
    processed_tokens: int
    truncated: bool
    strategy_used: str
    warnings: list[str] = field(default_factory=list)



def token_limits(max_position_embeddings: int) -> tuple[int, int]:
    """(recommended_max_tokens, absolute_max_tokens) derived from model
    metadata, reference semantics (``app/utils/model_metadata.py:245-247``):
    recommended = min(max_pos // 4, 2048), absolute = max_pos. The
    engine's 2048/8192 defaults are exactly this formula applied to the
    reference's default ``max_position_embeddings = 8192``."""
    return min(max_position_embeddings // 4, 2048), max_position_embeddings

def estimate_tokens(text: str) -> int:
    """Token estimate: 1 token ~= 4 chars (reference ``text_utils.py:63,167``)."""
    return len(text) // CHARS_PER_TOKEN


def truncate_by_tokens(text: str, max_tokens: int = 512) -> str:
    max_chars = max_tokens * CHARS_PER_TOKEN
    if len(text) <= max_chars:
        return text
    cut = text[:max_chars]
    last_space = cut.rfind(" ")
    # Only respect the word boundary when it keeps >80% of the budget.
    if last_space > max_chars * 0.8:
        cut = cut[:last_space]
    return cut + "..."


def extract_key_sentences(text: str, max_sentences: int = 3) -> str:
    sentences = [s.strip() for s in _SENTENCE_SPLIT.split(text) if s.strip()]
    if len(sentences) <= max_sentences:
        return text
    selected = [sentences[0]]
    if max_sentences > 1:
        mid_start = len(sentences) // 3
        selected.extend(sentences[mid_start : mid_start + max_sentences - 1])
    return ". ".join(selected) + "."


def smart_truncate(text: str, max_tokens: int = 512) -> str:
    max_chars = max_tokens * CHARS_PER_TOKEN
    if len(text) <= max_chars:
        return text
    out = []
    char_count = 0
    for sentence in _SENTENCE_SPLIT.split(text):
        sentence = sentence.strip()
        if not sentence:
            continue
        if char_count + len(sentence) + 2 > max_chars:  # +2 for ". "
            break
        out.append(sentence + ". ")
        char_count += len(sentence) + 2
    result = "".join(out)
    if not result.strip():
        return truncate_by_tokens(text, max_tokens)
    return result.strip()


STRATEGIES = ("smart_truncate", "truncate", "extract", "error")


def validate_and_process_text(
    text: str, max_tokens: int, strategy: str = "smart_truncate"
) -> tuple[str, ProcessingInfo]:
    if not text or not text.strip():
        raise ValueError("Text cannot be empty")
    text = text.strip()
    original_tokens = estimate_tokens(text)
    info = ProcessingInfo(
        original_tokens=original_tokens,
        processed_tokens=original_tokens,
        truncated=False,
        strategy_used=strategy,
    )
    if original_tokens <= max_tokens:
        return text, info

    if strategy == "error":
        raise ValueError(
            f"Text exceeds maximum token limit: {original_tokens} > {max_tokens} tokens"
        )
    if strategy == "truncate":
        processed = truncate_by_tokens(text, max_tokens)
    elif strategy == "extract":
        processed = extract_key_sentences(text, max(1, max_tokens // 100))
    else:  # smart_truncate (default)
        processed = smart_truncate(text, max_tokens)

    info.processed_tokens = estimate_tokens(processed)
    info.truncated = True
    if original_tokens > max_tokens * 2:
        info.warnings.append(
            f"Text was significantly longer than recommended ({original_tokens} tokens)"
        )
    if info.processed_tokens < original_tokens * 0.5:
        info.warnings.append("More than 50% of original text was removed")
    return processed, info


def process_text_with_options(
    text: str,
    max_tokens: int,
    absolute_max_tokens: int,
    strategy: str = "smart_truncate",
    auto_truncate: bool = True,
) -> tuple[str, ProcessingInfo]:
    """Single-text form of the reference batch loop
    (``text_utils.py:219-301``). NOTE: the limit checks use the
    UN-stripped length, and an under-limit text passes through
    UN-stripped — both observable reference behaviors."""
    estimated = estimate_tokens(text)
    if estimated > absolute_max_tokens:
        raise ValueError(
            f"Text exceeds absolute maximum token limit: "
            f"{estimated} > {absolute_max_tokens} tokens. "
            f"Please split the text into smaller chunks."
        )
    if estimated > max_tokens:
        if not auto_truncate:
            raise ValueError(
                f"Text exceeds recommended token limit: "
                f"{estimated} > {max_tokens} tokens. "
                f"Enable auto_truncate or reduce text length."
            )
        return validate_and_process_text(text, max_tokens, strategy)
    return text, ProcessingInfo(
        original_tokens=estimated,
        processed_tokens=estimated,
        truncated=False,
        strategy_used="none",
    )
