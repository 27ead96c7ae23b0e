"""Vectorized 64-bit hashing for shingles and sketches.

The reference derives h independent hash values per k-mer with ntHash
(rolling, submodule; call sites /root/reference/Common/SeqEval.h:50,
/root/reference/BioBloomMaker/BloomFilterGenerator.h:170).  We replace it
with the standard splitmix64 finalizer over a polynomial token-shingle hash,
extended to h values by Kirsch–Mitzenmacher double hashing — all numpy
``uint64`` vector ops, no per-row Python.

Everything here is deterministic and seed-free (a stable function of the
bytes) so filters built on different clusters / partitionings are
byte-comparable.
"""

from __future__ import annotations

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
    with np.errstate(over="ignore"):
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


def hash_tokens(tokens, cache: dict | None = None) -> np.ndarray:
    """Hash an iterable of str tokens → uint64 array, memoizing per token.

    Web-text token frequency is zipfian, so the cache hit rate is extreme;
    the per-unique-token python cost amortizes to ~0.
    """
    if cache is None:
        cache = {}
    out = np.empty(len(tokens), dtype=np.uint64)
    get = cache.get
    for i, t in enumerate(tokens):
        h = get(t)
        if h is None:
            h = hash_bytes(t.encode("utf-8", "surrogatepass"))
            cache[t] = h
        out[i] = h
    return out


def shingle_hashes(token_hashes: np.ndarray, w: int) -> np.ndarray:
    """Order-sensitive w-gram hashes over a token-hash sequence.

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
    with np.errstate(over="ignore"):
        for j in range(w):
            acc = (acc * POLY_BASE + token_hashes[j : n - w + 1 + j]) & _MASK64
    return splitmix64(acc)


def bloom_indices(hashes: np.ndarray, num_hashes: int, m_bits: int) -> np.ndarray:
    """Kirsch–Mitzenmacher: h_i = h1 + i*h2 (mod m) for i in [0, num_hashes).

    Returns shape (num_hashes, len(hashes)) uint64 of bit positions.
    Equivalent role to ntHash's multi-hash
    (/root/reference/Common/SeqEval.h:302: ``ntHashIterator(rec, hashNum,
    kmerSize)``) — h derived values per frame.
    """
    h1 = hashes
    h2 = splitmix64(hashes ^ _SM_M2) | _U64(1)  # odd → full-period stride
    i = np.arange(num_hashes, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + i * h2[None, :]) & _MASK64) % _U64(m_bits)
