"""Text kernels — whitespace cleaning, chunking, keyword relevance.

Behaviour-parity targets (reference files):
* ``clean_text``            → utils/web_utils.py:48-67 (also duplicated at
  semantic_strategy.py:231-237 etc.)
* ``squeeze_whitespace``    → the ``\\s+`` → ' ' + ``\\n\\s*\\n`` → '\\n' pair
  applied after text extraction (semantic_strategy.py:234-236,
  structured_strategy.py:505-507, rule_based_strategy.py:433-442)
* ``create_content_chunks`` → semantic_strategy.py:239-269 (sentence-boundary
  split, max 2000 / min 100 / overlap 200)
* ``keyword_relevance``     → semantic_strategy.py:349-371 (word-set overlap)

Pure functions; used inside pandas UDF batches and by driver-side tests.
"""

from __future__ import annotations

import re
from typing import List, Optional

_WS_RE = re.compile(r"\s+")
_BLANKLINE_RE = re.compile(r"\n\s*\n")
_WORD_RE = re.compile(r"\b\w+\b")

# Reference semantic-strategy chunker constants (semantic_strategy.py:51-53).
MIN_CHUNK_SIZE = 100
MAX_CHUNK_SIZE = 2000
CHUNK_OVERLAP = 200


def clean_text(text: str) -> str:
    """Collapse runs of whitespace to single spaces and strip."""
    if not text:
        return ""
    return _WS_RE.sub(" ", text).strip()


def squeeze_whitespace(text: str) -> str:
    """The post-extraction cleanup pair: ``\\s+``→' ' then blank-line squeeze,
    then strip.  (After the first substitution no newlines remain, so the
    second is a no-op — kept for exact behavioural parity.)"""
    text = _WS_RE.sub(" ", text)
    text = _BLANKLINE_RE.sub("\n", text)
    return text.strip()


def create_content_chunks(
    text: str,
    max_chunk_size: int = MAX_CHUNK_SIZE,
    min_chunk_size: int = MIN_CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> List[str]:
    """Sentence-boundary chunker with overlap — exact reference semantics:

    window ``[start, start+max)``; prefer the last '.' over the last '\\n'
    inside the window as the break (break index = boundary+1); chunks shorter
    than ``min_chunk_size`` after strip are dropped; next start is
    ``end - overlap``.
    """
    if len(text) <= max_chunk_size:
        return [text]

    chunks: List[str] = []
    start = 0
    while start < len(text):
        end = start + max_chunk_size
        if end < len(text):
            sentence_end = text.rfind(".", start, end)
            paragraph_end = text.rfind("\n", start, end)
            if sentence_end > start and sentence_end > paragraph_end:
                end = sentence_end + 1
            elif paragraph_end > start:
                end = paragraph_end + 1
        chunk = text[start:end].strip()
        if len(chunk) >= min_chunk_size:
            chunks.append(chunk)
        start = end - overlap
        if start >= len(text):
            break
    return chunks


def keyword_relevance(chunk: str, user_query: Optional[str]) -> float:
    """Deterministic relevance kernel: |query_words ∩ chunk_words| / |query_words|,
    0.5 default when there is no query."""
    if not user_query:
        return 0.5
    query_words = set(_WORD_RE.findall(user_query.lower()))
    if not query_words:
        return 0.5
    chunk_words = set(_WORD_RE.findall(chunk.lower()))
    matches = len(query_words.intersection(chunk_words))
    return min(1.0, matches / len(query_words))
