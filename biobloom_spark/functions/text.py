"""Deterministic text kernels: html→text extraction, tokenization, shingling.

The input_hint invariant requires byte-identical extracted text per url
across runs/clusters — so the extractor is a frozen, versioned, pure
function of the html bytes with no locale/env dependence.

The DUST low-complexity mask re-expresses the reference's sdust suppression
(/root/reference/Common/SDust.hpp:17-55, defaults T=20/W=64
/root/reference/Common/Options.cpp:36-38; wiring SeqEval.h:496-508) for
token streams: windows dominated by repeated tokens are masked and their
shingles treated as non-hits.
"""

from __future__ import annotations

import html as _htmlmod
import re

import numpy as np

from ..sketch.hashing import flat_shingle_hashes, hash_tokens, shingle_hashes

EXTRACTOR_VERSION = 1

# frozen regexes — any change bumps EXTRACTOR_VERSION
_RE_SCRIPT = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_RE_COMMENT = re.compile(rb"(?s)<!--.*?-->")
_RE_TAG = re.compile(rb"(?s)<[^>]*>")
_RE_WS = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """Strip markup from html bytes → canonical single-spaced text.

    Pure + deterministic: utf-8 with byte-preserving 'replace' fallback,
    script/style/comment removal, tag strip, entity unescape, whitespace
    collapse.  Frame-of-reference for the byte-identity pytest fixture.
    """
    if html_bytes is None:
        return ""
    b = _RE_SCRIPT.sub(b" ", html_bytes)
    b = _RE_COMMENT.sub(b" ", b)
    b = _RE_TAG.sub(b" ", b)
    text = b.decode("utf-8", "replace")
    text = _htmlmod.unescape(text)
    return _RE_WS.sub(" ", text).strip()


def tokenize(text: str) -> list[str]:
    """Whitespace tokenizer (the engine's k-mer alphabet analog).

    Deliberately trivial so the DuckDB oracle (``string_split(text, ' ')``)
    computes the identical token stream; richer normalization belongs in
    extract_text, upstream of the invariant boundary.
    """
    if not text:
        return []
    return text.split()


def frame_count(n_tokens: int, w: int) -> int:
    """#shingles = max(0, n_tokens - w + 1) — the reference's frame count
    ``len - k + 1`` (/root/reference/BioBloomMaker/BloomFilterGenerator.h:131).
    """
    return max(0, n_tokens - w + 1)


def dust_mask(tokens: list[str], w: int, min_distinct: int = 2) -> np.ndarray:
    """Boolean mask over shingle positions; True = low-complexity (masked).

    A shingle is masked when its window holds fewer than ``min_distinct``
    distinct tokens (pure repetition) — the token-stream analog of sdust's
    triplet-repetition score.  Returns empty for <w tokens.
    """
    n = frame_count(len(tokens), w)
    if n == 0:
        return np.zeros(0, dtype=bool)
    mask = np.zeros(n, dtype=bool)
    if min_distinct <= 1:
        return mask
    for i in range(n):
        if len(set(tokens[i : i + w])) < min_distinct:
            mask[i] = True
    return mask


def doc_shingle_hashes(
    text: str, w: int, cache: dict | None = None
) -> np.ndarray:
    """text → uint64 shingle-hash array (single-document path)."""
    toks = tokenize(text)
    if len(toks) < w:
        return np.empty(0, dtype=np.uint64)
    return shingle_hashes(hash_tokens(toks, cache), w)


def batch_doc_shingles(
    texts, w: int, cache: dict | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Whole-batch shingling (the hot path for maker and categorizer).

    Returns (frame_hashes, frame_offsets, token_hashes, token_counts):
    every doc's tokens hashed flat in one pass, windows crossing doc
    boundaries masked — output identical to per-doc ``doc_shingle_hashes``.
    """
    if cache is None:
        cache = {}
    all_tokens: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = (text or "").split()
        counts[i] = len(toks)
        all_tokens.extend(toks)
    token_hashes = hash_tokens(all_tokens, cache)
    frame_hashes, frame_offsets = flat_shingle_hashes(token_hashes, counts, w)
    return frame_hashes, frame_offsets, token_hashes, counts
