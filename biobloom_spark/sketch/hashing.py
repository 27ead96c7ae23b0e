"""Vectorized 64-bit hashing for shingles and sketches.

The reference derives h independent hash values per k-mer with ntHash
(rolling, submodule; call sites /root/reference/Common/SeqEval.h:50,
/root/reference/BioBloomMaker/BloomFilterGenerator.h:170).  We replace it
with the standard splitmix64 finalizer over a polynomial token-shingle hash,
extended to h values by Kirsch–Mitzenmacher double hashing — all numpy
``uint64`` vector ops, no per-row Python.

Performance notes (these paths dominate categorize throughput):
- integer overflow in numpy *array* ops wraps silently (mod-2^64 is exactly
  the semantics we want), so no errstate guards in the hot path;
- K-M probing reduces h1/h2 mod m once and then iterates add-subtract per
  hash function instead of materializing an (h, n) multiply-mod matrix
  (~5x faster at h=7);
- whole Arrow batches are shingled *flat* (one polynomial pass over every
  token of every doc, boundary-crossing windows masked out) instead of
  per-document numpy calls.

Everything here is deterministic and seed-free (a stable function of the
bytes) so filters built on different clusters / partitionings are
byte-comparable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)

# splitmix64 constants (public domain, Steele et al.)
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)

# polynomial rolling base for token sequences (odd, high-entropy)
POLY_BASE = _U64(0x100000001B3)  # FNV64 prime


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: avalanche a uint64 array."""
    z = (x + _SM_GAMMA) & _MASK64
    z = ((z ^ (z >> _U64(30))) * _SM_M1) & _MASK64
    z = ((z ^ (z >> _U64(27))) * _SM_M2) & _MASK64
    return z ^ (z >> _U64(31))


def hash_bytes(data: bytes) -> int:
    """Stable scalar FNV-1a 64 over bytes, then splitmix64 avalanche.

    Used per *unique* token (memoized by callers); the hot path stays in
    numpy.  Pure-python but O(len) on a handful of unique strings per batch.
    """
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return int(splitmix64(np.asarray([h], dtype=np.uint64))[0])


def hash_str_array(strs) -> np.ndarray:
    """Vectorized FNV-1a-64 + splitmix64 over a sequence of str.

    Byte-identical to ``hash_bytes(s.encode('utf-8','surrogatepass'))`` per
    element, but the FNV byte loop runs *across the batch*: strings are
    sorted longest-first so the active set at byte position j is a shrinking
    prefix — total numpy work = total encoded bytes, with only the utf-8
    encode (cython, pandas ``str.encode``) touching Python objects.
    """
    n = len(strs)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    import pandas as pd

    enc = pd.Series(strs, dtype=object).str.encode("utf-8", "surrogatepass").to_numpy()
    lens = np.fromiter((len(b) for b in enc), count=n, dtype=np.int64)
    order = np.argsort(-lens, kind="stable")
    lens_s = lens[order]
    flat = np.frombuffer(b"".join(enc[order]), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens_s[:-1], out=starts[1:])
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    neg = -lens_s  # ascending; count(len > j) = searchsorted(neg, -j, 'left')
    maxlen = int(lens_s[0])
    prime = POLY_BASE
    for j in range(maxlen):
        active = int(np.searchsorted(neg, -j, side="left"))
        idx = starts[:active] + j
        h[:active] = (h[:active] ^ flat[idx]) * prime
    out[order] = splitmix64(h)
    return out


#: memo-size cap: beyond this the worker-lifetime token cache stops growing
#: (zipf head stays resident; the long tail re-hashes via the vector path)
_CACHE_MAX = 1 << 22


def hash_unique_tokens(uniques, cache: dict | None = None) -> np.ndarray:
    """Hash an array of *unique* str tokens → uint64 array, consulting the
    worker-lifetime cache so only cache-missing uniques hit the hasher."""
    uniq_hashes = np.empty(len(uniques), dtype=np.uint64)
    if cache is None:
        uniq_hashes[:] = hash_str_array(uniques)
        return uniq_hashes
    get = cache.get
    missing: list[str] = []
    missing_pos: list[int] = []
    for k, t in enumerate(uniques):
        hv = get(t)
        if hv is None:
            missing.append(t)
            missing_pos.append(k)
        else:
            uniq_hashes[k] = hv
    if missing:
        mh = hash_str_array(missing)
        uniq_hashes[missing_pos] = mh
        if len(cache) < _CACHE_MAX:
            cache.update(zip(missing, mh.tolist()))
    return uniq_hashes


def hash_tokens(tokens, cache: dict | None = None) -> np.ndarray:
    """Hash an iterable of str tokens → uint64 array.

    ``pd.factorize`` (C speed) collapses the batch to unique tokens; only
    cache-missing uniques are hashed, via the vectorized batch hasher.
    Web-text token frequency is zipfian, so the unique set is small and the
    cross-batch cache hit rate is extreme.
    """
    import pandas as pd

    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    codes, uniques = pd.factorize(
        tokens if isinstance(tokens, np.ndarray) else np.asarray(tokens, dtype=object)
    )
    return hash_unique_tokens(uniques, cache)[codes]


def shingle_hashes(token_hashes: np.ndarray, w: int) -> np.ndarray:
    """Order-sensitive w-gram hashes over one token-hash sequence.

    Analog of the reference's k-mer sliding window (frame count
    ``len - k + 1``, /root/reference/BioBloomMaker/BloomFilterGenerator.h:131).
    Polynomial combination then splitmix64 avalanche; O(n·w) vectorized.
    Returns an empty array when fewer than w tokens (the reference's
    "read shorter than k" guard, /root/reference/Common/SeqEval.h:221-223).
    """
    n = token_hashes.shape[0]
    if n < w:
        return np.empty(0, dtype=np.uint64)
    acc = np.zeros(n - w + 1, dtype=np.uint64)
    for j in range(w):
        acc = (acc * POLY_BASE + token_hashes[j : n - w + 1 + j]) & _MASK64
    return splitmix64(acc)


def flat_valid_windows(
    token_counts: np.ndarray, w: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc valid window start positions over a flat token array.

    Returns ``(valid, frame_offsets)``: ``valid`` holds the flat token
    indices where a w-window starts without crossing a document boundary
    (doc i's windows are ``valid[frame_offsets[i]:frame_offsets[i+1]]``).
    Pure vector arithmetic (ramp trick), no Python loop.
    """
    token_counts = np.asarray(token_counts, dtype=np.int64)
    frames = np.maximum(0, token_counts - (w - 1))
    offsets = np.zeros(token_counts.size + 1, dtype=np.int64)
    np.cumsum(frames, out=offsets[1:])
    total = int(offsets[-1])
    if total == 0:
        return np.empty(0, dtype=np.int64), offsets
    # valid window start positions (flat token index) per doc:
    # tok_start[i] .. tok_start[i] + frames[i] - 1
    tok_start = np.zeros(token_counts.size, dtype=np.int64)
    np.cumsum(token_counts[:-1], out=tok_start[1:])
    doc_of_frame = np.repeat(np.arange(token_counts.size), frames)
    within = np.arange(total) - np.repeat(offsets[:-1], frames)
    return tok_start[doc_of_frame] + within, offsets


def flat_shingle_hashes(
    token_hashes: np.ndarray, token_counts: np.ndarray, w: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batch shingling: many docs' tokens concatenated → (frame_hashes,
    frame_offsets).

    ``token_hashes`` is every doc's token hashes back-to-back;
    ``token_counts[i]`` is doc i's token count.  One polynomial pass over
    the whole flat array; window positions that would cross a document
    boundary are dropped.  Identical output to per-doc ``shingle_hashes``
    (same polynomial over the same w tokens), ~10x faster on small docs.
    """
    valid, offsets = flat_valid_windows(token_counts, w)
    n = token_hashes.shape[0]
    if n < w or int(offsets[-1]) == 0:
        return np.empty(0, dtype=np.uint64), offsets
    acc = np.zeros(n - w + 1, dtype=np.uint64)
    for j in range(w):
        acc = (acc * POLY_BASE + token_hashes[j : n - w + 1 + j]) & _MASK64
    return splitmix64(acc[valid]), offsets


def canonical_flat_shingle_hashes(
    token_hashes: np.ndarray,
    rc_token_hashes: np.ndarray,
    token_counts: np.ndarray,
    w: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Strand-canonical batch shingling: hash(frame) == hash(revcomp(frame)).

    The reference hashes k-mers canonically — ntHash returns one value for
    a k-mer and its reverse complement (asserted by its own test,
    /root/reference/Tests/ntHashTests.cpp:20-41; RC machinery
    /root/reference/Common/Sequence.cpp).  Here: alongside the forward
    polynomial (descending powers over token hashes), compute the
    reverse-complement polynomial — ascending powers over the
    *revcomp-token* hashes, which equals the forward polynomial of the
    reverse-complemented frame — and avalanche the elementwise min.
    Proof of invariance: fwd(revcomp(F)) == rc(F) and rc(revcomp(F)) ==
    fwd(F), so min is unchanged under strand flip.

    ``rc_token_hashes[i]`` must hold the hash of token i's
    reverse-complement string (for 1-char DNA tokens: the complement
    base).  Same output shape as ``flat_shingle_hashes``.
    """
    valid, offsets = flat_valid_windows(token_counts, w)
    n = token_hashes.shape[0]
    if n < w or int(offsets[-1]) == 0:
        return np.empty(0, dtype=np.uint64), offsets
    m = n - w + 1
    fwd = np.zeros(m, dtype=np.uint64)
    rc = np.zeros(m, dtype=np.uint64)
    # ascending powers B^0..B^{w-1} (0-d array arithmetic: silent wrap)
    pw = np.array(1, dtype=np.uint64)
    base = np.array(POLY_BASE, dtype=np.uint64)
    for j in range(w):
        fwd = (fwd * POLY_BASE + token_hashes[j : m + j]) & _MASK64
        rc = (rc + rc_token_hashes[j : m + j] * pw) & _MASK64
        pw = pw * base
    return splitmix64(np.minimum(fwd, rc)[valid]), offsets


def km_probe(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Kirsch–Mitzenmacher base pair (h1, h2-odd) — computed once per batch
    and shared across filters of different sizes."""
    h2 = splitmix64(hashes ^ _SM_M2) | _U64(1)  # odd → full-period stride
    return hashes, h2


_LO32 = _U64(0xFFFFFFFF)
_S32 = _U64(32)


def mulhigh64(a: np.ndarray, b) -> np.ndarray:
    """High 64 bits of the 128-bit product a*b (vectorized u64).

    This is Lemire's "fastrange" reduction ``(a * n) >> 64`` — maps a
    uniform u64 to [0, n) *monotonically* in ``a``, unlike ``a % n``.
    Monotonicity is the load-bearing property: sorted unique hashes give
    sorted word indices, so bulk insert becomes a sequential
    ``bitwise_or.reduceat`` instead of a random-scatter ``np.bitwise_or.at``
    (measured 25x faster at 10^7 items), and the bitmap becomes
    range-partitionable by hash prefix for the segmented distributed merge.
    numpy has no 128-bit multiply; split into 32-bit halves (3 multiplies).
    ``b`` may be a scalar or an array (per-element ranges).
    """
    if np.isscalar(b) or np.ndim(b) == 0:
        # scalar-b fast path with explicit buffer reuse: naive chaining
        # allocates ~12 array temporaries, and on first touch this VM
        # page-faults at ~150 MB/s — buffer reuse measured 3-10x faster on
        # merge-sized (10^7) inputs
        bl = np.uint64(int(b) & 0xFFFFFFFF)
        bh = np.uint64(int(b) >> 32)
        al = np.bitwise_and(a, _LO32)
        ah = np.right_shift(a, _S32)
        ll = np.multiply(al, bl)
        np.right_shift(ll, _S32, out=ll)
        lh = np.multiply(al, bh, out=al)  # al dead → reuse
        lo_lh = np.bitwise_and(lh, _LO32)
        hi_lh = np.right_shift(lh, _S32, out=lh)
        hl = np.multiply(ah, bl)
        np.add(ll, lo_lh, out=ll)
        np.bitwise_and(hl, _LO32, out=lo_lh)
        np.add(ll, lo_lh, out=ll)
        np.right_shift(ll, _S32, out=ll)  # mid >> 32
        out = np.multiply(ah, bh, out=ah)  # ah dead → reuse
        np.add(out, hi_lh, out=out)
        np.add(out, np.right_shift(hl, _S32, out=hl), out=out)
        np.add(out, ll, out=out)
        return out
    b = np.asarray(b, dtype=np.uint64)
    al = a & _LO32
    ah = a >> _S32
    bl = b & _LO32
    bh = b >> _S32
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    mid = (ll >> _S32) + (lh & _LO32) + (hl & _LO32)
    return ah * bh + (lh >> _S32) + (hl >> _S32) + (mid >> _S32)


def km_indices_iter(
    h1: np.ndarray, h2: np.ndarray, num_hashes: int, m_bits: int
) -> Iterator[np.ndarray]:
    """Yield bit positions for each of the h hash functions as int64 arrays.

    ``h_i = (h1 + i*h2) mod m`` computed incrementally: reduce h1, h2 mod m
    once (2 uint64 modulos), then per function one add + one conditional
    subtract — no (h, n) matrix, no repeated uint64 modulo.
    """
    m = np.int64(m_bits)
    idx = (h1 % _U64(m_bits)).astype(np.int64)
    step = (h2 % _U64(m_bits)).astype(np.int64)
    yield idx
    for _ in range(1, num_hashes):
        idx = idx + step
        idx[idx >= m] -= m
        yield idx


def bloom_indices(hashes: np.ndarray, num_hashes: int, m_bits: int) -> np.ndarray:
    """(num_hashes, n) bit-position matrix — convenience wrapper over the
    iterative probe (kept for tests/small inputs)."""
    h1, h2 = km_probe(hashes)
    return np.stack(list(km_indices_iter(h1, h2, num_hashes, m_bits))).astype(np.uint64)
