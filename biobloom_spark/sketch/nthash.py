"""ntHash — the reference's DNA rolling hash, reimplemented from the
published algorithm (Mohamadi, Chu, Coombe, Birol: "ntHash: recursive
nucleotide hashing", Bioinformatics 2016; public reference implementation
bcgsc/ntHash).  The reference consumes it through
``btl_bloomfilter/vendor/ntHashIterator.hpp`` (include sites
/root/reference/Common/SeqEval.h:20,
/root/reference/BioBloomMaker/BloomFilterGenerator.h:13); the vendored
submodule is absent from the checkout, so this module follows the
*published* recurrence and constants — nothing is transcribed from the
reference tree.

Published definition (ntHash v1):
- per-base 64-bit seeds (the paper's published constants)
- forward strand:  fh(s) = XOR_i rol(seed(s_i), k-1-i)
- reverse strand:  rh(s) = XOR_i rol(seed(comp(s_i)), i)
- canonical NTC64: min(fh, rh)  → strand-invariant
  (the property the reference's own test asserts,
  /root/reference/Tests/ntHashTests.cpp:20-41)
- rolling update:  fh' = rol(fh,1) ^ rol(seed(out), k) ^ seed(in)
- extra hashes (NTM64): t = h * (i ^ k·multiSeed); t ^= t >> multiShift

Vectorization: the direct (non-rolling) form is a k-pass XOR of
constant-rotated seed arrays over the flat base array — the same
flat-window shape as ``flat_shingle_hashes`` — so whole batches hash with
no per-base Python.  The rolling form exists as a scalar reference used
by tests to check the published recurrence and the direct form agree.
"""

from __future__ import annotations

import numpy as np

from .hashing import flat_valid_windows

_U64 = np.uint64

# published ntHash base seeds
SEED_A = 0x3C8BFBB395C60474
SEED_C = 0x3193C18562A02B4C
SEED_G = 0x20323ED082572324
SEED_T = 0x295549F54BE24456
SEED_N = 0x0000000000000000

# published multi-hash constants
MULTISEED = _U64(0x90B45D39FB6DA1FA)
MULTISHIFT = _U64(27)

_SEED_TAB = np.zeros(256, dtype=np.uint64)
_RC_SEED_TAB = np.zeros(256, dtype=np.uint64)
for _b, _s, _c in (
    ("A", SEED_A, SEED_T),
    ("C", SEED_C, SEED_G),
    ("G", SEED_G, SEED_C),
    ("T", SEED_T, SEED_A),
):
    for _ch in (_b, _b.lower()):
        _SEED_TAB[ord(_ch)] = _s
        _RC_SEED_TAB[ord(_ch)] = _c
# every other byte (N, ambiguity codes) hashes as SEED_N = 0


def _rol_const(v: np.ndarray, s: int) -> np.ndarray:
    """Rotate-left by a constant — vectorized, shift-by-0 safe."""
    s &= 63
    if s == 0:
        return v
    return (v << _U64(s)) | (v >> _U64(64 - s))


def _seq_bytes(seqs) -> tuple[np.ndarray, np.ndarray]:
    """Flat uint8 byte array + per-seq lengths for a batch of strings."""
    lens = np.fromiter((len(s or "") for s in seqs), dtype=np.int64, count=len(seqs))
    flat = np.frombuffer(
        "".join(s or "" for s in seqs).encode("ascii", "replace"), dtype=np.uint8
    )
    return flat, lens


def batch_ntc64(seqs, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Canonical ntHash (NTC64) for every *valid* k-mer of every sequence.

    Returns (hashes, frame_offsets) in the ``flat_shingle_hashes`` shape:
    seq i's k-mer hashes are ``hashes[offsets[i]:offsets[i+1]]``.

    K-mers containing a non-ACGT base (N / ambiguity codes) are skipped —
    dropped from both the hash output and the per-seq frame counts — the
    reference's ntHashIterator semantics (it rolls past N-containing
    k-mers, so reference-built ``.bf`` filters never contain them and
    reference scoring excludes them from frame counts).
    """
    flat, lens = _seq_bytes(seqs)
    valid, offsets = flat_valid_windows(lens, k)
    n = flat.size
    if n < k or int(offsets[-1]) == 0:
        return np.empty(0, dtype=np.uint64), offsets
    sv = _SEED_TAB[flat]
    rv = _RC_SEED_TAB[flat]
    m = n - k + 1
    fh = np.zeros(m, dtype=np.uint64)
    rh = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        fh ^= _rol_const(sv[j : m + j], k - 1 - j)
        rh ^= _rol_const(rv[j : m + j], j)
    hashes = np.minimum(fh, rh)[valid]
    # per-base validity → sliding any() over each k-window (SEED_TAB is 0
    # exactly for bytes outside ACGTacgt); window i is bad iff any of
    # flat[i:i+k] is invalid — prefix-sum difference, no Python loop
    invalid = sv == 0
    if invalid.any():
        csum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(invalid, out=csum[1:])
        good = (csum[valid + k] - csum[valid]) == 0
        frames = np.diff(offsets)
        ndocs = frames.size
        doc_of_frame = np.repeat(np.arange(ndocs), frames)
        new_counts = np.bincount(doc_of_frame[good], minlength=ndocs)
        offsets = np.zeros(ndocs + 1, dtype=np.int64)
        np.cumsum(new_counts, out=offsets[1:])
        hashes = hashes[good]
    return hashes, offsets


def ntm64(base: np.ndarray, k: int, num_hashes: int) -> np.ndarray:
    """Extra hash values from one base hash (NTM64): out[0] = base,
    out[i] = avalanche(base * (i ^ k*multiSeed)) — the published
    multi-hash recurrence."""
    out = np.empty((num_hashes, base.size), dtype=np.uint64)
    out[0] = base
    kk = np.array(k, dtype=np.uint64) * MULTISEED  # 0-d: silent wrap
    for i in range(1, num_hashes):
        t = base * (_U64(i) ^ kk)
        t ^= t >> MULTISHIFT
        out[i] = t
    return out


def nt_positions(base: np.ndarray, k: int, num_hashes: int, m_bits: int) -> np.ndarray:
    """(h, n) bit positions for classic-layout probing: NTM64 values mod
    the bit-array size — the published btl BloomFilter convention."""
    return (ntm64(base, k, num_hashes) % _U64(m_bits)).astype(np.int64)


# --------------------------------------------------------------------------
# scalar rolling reference (tests only): the published recurrence verbatim
# --------------------------------------------------------------------------
def _rol1(v: int, s: int) -> int:
    s &= 63
    v &= 0xFFFFFFFFFFFFFFFF
    return ((v << s) | (v >> (64 - s))) & 0xFFFFFFFFFFFFFFFF if s else v


def rolling_ntc64(seq: str, k: int) -> list[int]:
    """Scalar NTC64 via the published *rolling* updates — used by tests to
    confirm the vectorized direct form implements the same recurrence.

    Like the reference's ntHashIterator, k-mers containing a non-ACGT base
    are skipped (the rolling state still advances — rolling past an
    N-containing window with SEED_N=0 contributions yields exactly the
    direct-form value once the window is N-free again, so no re-init is
    needed; only the emission is suppressed)."""
    if len(seq) < k:
        return []
    raw = seq.encode("ascii", "replace")
    st = [int(_SEED_TAB[b]) for b in raw]
    rt = [int(_RC_SEED_TAB[b]) for b in raw]
    bad = [s == 0 for s in st]
    fh = 0
    rh = 0
    for i in range(k):
        fh ^= _rol1(st[i], k - 1 - i)
        rh ^= _rol1(rt[i], i)
    out = [] if any(bad[:k]) else [min(fh, rh)]
    for i in range(1, len(seq) - k + 1):
        # fh' = rol(fh,1) ^ rol(seed(out),k) ^ seed(in)
        fh = _rol1(fh, 1) ^ _rol1(st[i - 1], k) ^ st[i + k - 1]
        # rh' = ror(rh,1) ^ ror(seed(comp(out)),1) ^ rol(seed(comp(in)),k-1)
        rh = _rol1(rh, 63) ^ _rol1(rt[i - 1], 63) ^ _rol1(rt[i + k - 1], k - 1)
        if not any(bad[i : i + k]):
            out.append(min(fh, rh))
    return out
