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


def _window_distinct_lt(codes: np.ndarray, w: int, min_distinct: int) -> np.ndarray:
    """True where the length-``w`` window starting at each position holds
    fewer than ``min_distinct`` distinct code values.

    Vectorized: position ``i`` of a window contributes a new distinct value
    iff it differs from every earlier position — O(w²) sliced vector
    comparisons, no per-window Python (w is small: the shingle width).
    """
    n = codes.shape[0] - w + 1
    if n <= 0:
        return np.zeros(max(n, 0), dtype=bool)
    if min_distinct <= 1:
        return np.zeros(n, dtype=bool)
    distinct = np.ones(n, dtype=np.int32)
    new_i = np.empty(n, dtype=bool)
    for i in range(1, w):
        new_i[:] = True
        for j in range(i):
            new_i &= codes[j : n + j] != codes[i : n + i]
        distinct += new_i
        if i >= min_distinct - 1:
            # early exit: windows that already reached min_distinct can't
            # drop back; only continue if some window is still short
            if distinct.min() >= min_distinct:
                return np.zeros(n, dtype=bool)
    return distinct < min_distinct


def dust_mask(tokens: list[str], w: int, min_distinct: int = 2) -> np.ndarray:
    """Boolean mask over shingle positions; True = low-complexity (masked).

    A shingle is masked when its window holds fewer than ``min_distinct``
    distinct tokens (pure repetition) — the token-stream analog of sdust's
    triplet-repetition score.  Returns empty for <w tokens.
    """
    n = frame_count(len(tokens), w)
    if n == 0:
        return np.zeros(0, dtype=bool)
    if min_distinct <= 1:
        return np.zeros(n, dtype=bool)
    import pandas as pd

    codes, _ = pd.factorize(np.asarray(tokens, dtype=object))
    return _window_distinct_lt(codes, w, min_distinct)


def flat_dust_mask(
    token_hashes: np.ndarray,
    token_counts: np.ndarray,
    w: int,
    min_distinct: int = 2,
) -> np.ndarray:
    """Batch DUST mask over the flat token-hash array (the categorizer's
    hot -D path): one vectorized distinct-count pass over all windows, then
    the per-doc valid windows selected exactly as ``flat_shingle_hashes``
    selects frames.  Token equality is judged on 64-bit hashes (collision
    odds ≈ w²/2⁶⁵ per window — immaterial for a masking heuristic).
    """
    from ..sketch.hashing import flat_valid_windows

    valid, offsets = flat_valid_windows(np.asarray(token_counts, np.int64), w)
    if offsets[-1] == 0:
        return np.zeros(0, dtype=bool)
    lt = _window_distinct_lt(token_hashes, w, min_distinct)
    return lt[valid]


def batch_frames(
    texts,
    w: int,
    cache: dict | None = None,
    canonical: bool = False,
    hash_family: str = "poly",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Family dispatch for the frame hasher.

    "poly" → ``batch_doc_shingles`` (native polynomial token shingles);
    "nthash" → published ntHash NTC64 k-mers over the de-spaced character
    sequence (DNA ``.bf`` interop; canonical by construction).  Same
    4-tuple shape; in nthash mode ``token_hashes`` is empty and
    ``token_counts`` holds base counts (read lengths).
    """
    if hash_family == "nthash":
        from ..sketch.nthash import batch_ntc64

        seqs = [(t or "").replace(" ", "") for t in texts]
        frames, offsets = batch_ntc64(seqs, w)
        lens = np.fromiter((len(s) for s in seqs), dtype=np.int64, count=len(seqs))
        return frames, offsets, np.empty(0, dtype=np.uint64), lens
    return batch_doc_shingles(texts, w, cache, canonical)


def doc_shingle_hashes(
    text: str, w: int, cache: dict | None = None
) -> np.ndarray:
    """text → uint64 shingle-hash array (single-document path)."""
    toks = tokenize(text)
    if len(toks) < w:
        return np.empty(0, dtype=np.uint64)
    return shingle_hashes(hash_tokens(toks, cache), w)


#: DNA complement for canonical hashing (non-ACGT characters, e.g. N,
#: complement to themselves — the reference's ambiguity handling)
_DNA_COMP = str.maketrans("ACGTacgt", "TGCAtgca")


def revcomp(token: str) -> str:
    """Reverse-complement of a token string (identity on non-ACGT)."""
    return token[::-1].translate(_DNA_COMP)


def batch_doc_shingles(
    texts, w: int, cache: dict | None = None, canonical: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Whole-batch shingling (the hot path for maker and categorizer).

    Returns (frame_hashes, frame_offsets, token_hashes, token_counts):
    every doc's tokens hashed flat in one pass, windows crossing doc
    boundaries masked — output identical to per-doc ``doc_shingle_hashes``.

    ``canonical=True`` makes frame hashes strand-invariant (DNA mode:
    hash(frame) == hash(revcomp(frame)), the reference's ntHash canonical
    semantics) via ``canonical_flat_shingle_hashes``; the per-unique
    revcomp-token hashing is negligible — DNA mode's unique-token set is
    the base alphabet.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sketch.hashing import hash_unique_tokens

    if cache is None:
        cache = {}
    # tokenize + flatten + unique-encode entirely in Arrow C kernels: the
    # full token stream never exists as Python objects.  Only the *unique*
    # tokens (small and zipf-headed in web text) cross into Python, to be
    # hashed/cached.  Whitespace-split semantics match str.split() except
    # that Arrow emits "" tokens at string edges — filtered below.
    arr = pa.array(texts, type=pa.string(), from_pandas=True)
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    sp = pc.utf8_split_whitespace(arr)
    flat = pc.list_flatten(sp)
    counts = np.diff(np.asarray(sp.offsets, dtype=np.int64))
    enc = pc.dictionary_encode(flat)
    codes = np.asarray(enc.indices)
    uniques = enc.dictionary.to_numpy(zero_copy_only=False)
    uniq_hashes = hash_unique_tokens(uniques, cache)
    empty_pos = np.flatnonzero(uniques == "")
    if empty_pos.size:
        # drop edge-whitespace "" tokens; every split list is non-empty
        # ("" splits to [""]), so reduceat segments are well-formed
        drop = codes == empty_pos[0]
        counts = counts - np.add.reduceat(
            drop.astype(np.int64), np.cumsum(counts) - counts
        )
        codes = codes[~drop]
    token_hashes = uniq_hashes[codes]
    if canonical:
        from ..sketch.hashing import canonical_flat_shingle_hashes

        rc_uniq = np.array([revcomp(t) for t in uniques], dtype=object)
        rc_token_hashes = hash_unique_tokens(rc_uniq, cache)[codes]
        frame_hashes, frame_offsets = canonical_flat_shingle_hashes(
            token_hashes, rc_token_hashes, counts, w
        )
    else:
        frame_hashes, frame_offsets = flat_shingle_hashes(token_hashes, counts, w)
    return frame_hashes, frame_offsets, token_hashes, counts
