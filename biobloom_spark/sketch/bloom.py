"""Mergeable Bloom filter sketch (the engine's core state).

Re-implements, from the published formulas, the semantics of the reference's
Bloom layer:

- sizing: ``m = -n*h / ln(1 - p^(1/h))`` rounded up to a multiple of 64
  (/root/reference/Common/BloomFilterInfo.h:57-65)
- optimal hash count: ``h = floor(-ln(p)/ln 2)``
  (/root/reference/Common/BloomFilterInfo.h:73-76)
- achieved FPR: ``(1 - (1 - 1/m)^(n*h))^h``
  (/root/reference/Common/BloomFilterInfo.cpp:172-178)
- redundancy FPR: mean incremental FPR over inserts
  (/root/reference/Common/BloomFilterInfo.cpp:183-204)
- insertAndCheck semantics: count of already-present items
  (/root/reference/BioBloomMaker/BloomFilterGenerator.h:170-188)

State is a numpy ``uint8`` byte array of ``m/8`` bytes; merge is associative,
commutative, idempotent bitwise OR — the property that makes distributed
partial-build + tree-merge correct (/root/reference's multi-file insert loop,
BloomFilterGenerator.h:145-186, is the single-node special case).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .hashing import km_indices_iter, km_probe, mulhigh64

_BIT_LUT = (np.uint8(1) << np.arange(8, dtype=np.uint8))  # bit masks by idx&7
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

__all__ = [
    "optimal_hash_num",
    "optimal_size_bits",
    "blocked_size_bits",
    "approx_fpr",
    "BloomSketch",
    "probe_words64",
    "word_index64",
    "or_scatter_sorted",
]


def probe_words64(h2: np.ndarray, num_hashes: int) -> np.ndarray:
    """Per-item 64-bit word with the h probe bits set (6-bit offsets sliced
    from h2) — the whole membership footprint of the single-word layout in
    one register.  Slices start at bit 4 (= 64 % 6): km_probe forces h2 odd,
    so slicing from bit 0 would bias probe 0 to odd offsets.

    Module-level (not a method) so the distributed segment builders in the
    maker provably compute the identical footprint as query-time probes.
    """
    w = np.zeros(h2.size, dtype=np.uint64)
    for i in range(num_hashes):
        w |= np.uint64(1) << ((h2 >> np.uint64(6 * i + 4)) & np.uint64(63))
    return w


def word_index64(
    h1: np.ndarray, n_words: int, seg_offsets: np.ndarray | None = None
) -> np.ndarray:
    """Word index for the 64-bit blocked layout: fastrange (``mulhigh``),
    MONOTONE in h1 — sorted hashes → sorted indices (see mulhigh64).

    Segmented variant (``seg_offsets``: int64[S+1] word offsets, S a power
    of two): the top log2(S) bits of h1 pick the segment, the rest
    fastrange into that segment's word range.  This is the layout the
    distributed merge builds slice-by-slice: segment s of the bitmap is a
    pure function of the hashes whose prefix is s, so S reducers build
    S independent slices and the registry concatenates them.
    """
    if seg_offsets is None:
        return mulhigh64(h1, np.uint64(n_words)).astype(np.int64)
    S = len(seg_offsets) - 1
    k = S.bit_length() - 1
    if k == 0:
        return mulhigh64(h1, np.uint64(n_words)).astype(np.int64)
    seg = (h1 >> np.uint64(64 - k)).astype(np.int64)
    nw = np.diff(seg_offsets)[seg].astype(np.uint64)
    local = mulhigh64(h1 << np.uint64(k), nw).astype(np.int64)
    return seg_offsets[seg] + local


def or_scatter_sorted(words: np.ndarray, widx: np.ndarray, pw: np.ndarray) -> None:
    """OR probe-words into ``words`` at (sorted, possibly repeated) indices.

    Groups equal indices with one ``bitwise_or.reduceat`` then writes each
    target word once — sequential memory order, no unbuffered per-element
    ``np.bitwise_or.at`` (which measured ~5 s per 1.5e7 items)."""
    if widx.size == 0:
        return
    starts = np.flatnonzero(np.concatenate(([True], widx[1:] != widx[:-1])))
    ored = np.bitwise_or.reduceat(pw, starts)
    tgt = widx[starts]
    words[tgt] |= ored


def optimal_hash_num(fpr: float) -> int:
    """floor(-ln p / ln 2), min 1 (BloomFilterInfo.h:73-76)."""
    return max(1, int(-math.log(fpr) / math.log(2)))


def optimal_size_bits(n_entries: int, fpr: float, num_hashes: int) -> int:
    """m = ceil(-n*h / ln(1 - p^(1/h))), rounded up to x64.

    (BloomFilterInfo.h:57-65: ``-double(entries) * hashNum /
    log(1 - pow(fpr, 1/hashNum))``, +63 then /64*64.)
    """
    n = max(1, int(n_entries))
    m = -float(n) * num_hashes / math.log(1.0 - fpr ** (1.0 / num_hashes))
    m = int(math.ceil(m))
    return ((m + 63) // 64) * 64


def blocked_size_bits(n_entries: int, fpr: float, num_hashes: int, block_bits: int = 64) -> int:
    """Sizing for the *blocked* variants (Putze, Sanders & Singler 2007,
    "Cache-, Hash- and Space-Efficient Bloom Filters"): all h probes of an
    item land in one block, so a probe costs one memory access instead of
    h — the decisive lever for multi-core scaling (see BENCH.md).

    Block-occupancy variance costs FPR; the sizing margin compensates:
    fpr/4 (~+35% bits) suffices for 512-bit blocks, fpr/8 (~+50%) for the
    64-bit single-word layout — both validated empirically by the
    FPR-bound tests, which probe the *built* filter, not the formula.
    """
    margin = 8.0 if block_bits <= 64 else 4.0
    m = optimal_size_bits(n_entries, fpr / margin, num_hashes)
    return ((m + block_bits - 1) // block_bits) * block_bits


def resolve_block_layout(
    fpr: float, num_hashes: int | None, block_bits: int
) -> tuple[int, int]:
    """Pick an (h, block_bits) pair that actually fits the layout.

    Blocked layouts slice the h probe offsets from the 64 bits of h2, so
    ``h * log2(block_bits) <= 64`` (h<=10 for 64-bit words, h<=7 for
    512-bit lines); a 64-bit block also has a practical FPR floor around
    (h/64)^h ~ 1e-8.  The reference supports arbitrary -f FPRs
    (/root/reference/Common/Options.cpp:26 is only a default), so instead
    of raising deep inside executors:

    - derived h (num_hashes=None): clamp h into the layout and let the
      sizing formula spend bits instead of probes; downgrade the layout
      (64 -> 512 -> classic) when the target fpr is below its floor.
    - explicit h: keep the user's h and downgrade the layout to one that
      can host it (512-bit line for h<=7, else classic).
    """
    if not block_bits:
        return (num_hashes or optimal_hash_num(fpr)), 0
    if num_hashes is not None:
        bpb = block_bits.bit_length() - 1
        if num_hashes * bpb <= 64:
            return num_hashes, block_bits
        if num_hashes * 9 <= 64:
            return num_hashes, 512
        return num_hashes, 0
    h = optimal_hash_num(fpr)
    if fpr < 1e-7:  # below the 64-bit word's practical floor
        if fpr < 1e-12:  # below the 512-bit line's practical floor
            return h, 0
        return min(h, 7), 512
    bpb = block_bits.bit_length() - 1
    return min(h, 64 // bpb), block_bits


def approx_fpr(m_bits: int, n_entries: int, num_hashes: int) -> float:
    """(1 - (1 - 1/m)^(h*n))^h (BloomFilterInfo.cpp:172-178)."""
    if m_bits <= 0:
        return 1.0
    # use expm1/log1p form for numerical stability at large m
    load = math.exp(num_hashes * n_entries * math.log1p(-1.0 / m_bits))
    return (1.0 - load) ** num_hashes


@dataclass
class BloomSketch:
    """Fixed-parameter Bloom filter with batch insert/contains and OR-merge.

    Key contract: inputs are *avalanched uniform 64-bit hashes* (every
    engine path feeds splitmix64 output — sketch.hashing).  The 64-bit
    blocked layout selects its word by fastrange on the HIGH bits
    (word_index64), so low-entropy raw integers would skew the load; hash
    first (as all callers do).

    Layouts (same serialization, merge, and counter semantics):
    - ``block_bits=0``  classic: h independent positions over the whole
      array (the reference's semantics).
    - ``block_bits=512`` cache-line blocked: ``h1`` selects a 64-byte
      block, h bit offsets from 9-bit slices of ``h2`` — one memory line
      per probe.
    - ``block_bits=64`` single-word blocked (default): all h bits live in
      one uint64 selected by ``h1``; insert pre-combines the word and does
      ONE scatter per item, query does ONE gather then register-width
      shift tests — the fastest layout by far for bulk insert (~6x) and
      the multi-core scaling winner.
    """

    m_bits: int
    num_hashes: int
    bits: np.ndarray = field(default=None)  # uint8[m_bits/8]
    n_inserted: int = 0  # frames inserted (incl. duplicates)
    n_new: int = 0  # insertAndCheck "was absent" count → totalEntries
    n_redundant: int = 0  # insertAndCheck "already present" → redundancy
    block_bits: int = 0  # 0 = classic; 512 = cache-line blocked
    #: segmented 64-bit layout: int64[S+1] word offsets (S a power of two);
    #: segment s (top log2 S bits of h1) owns words [off[s], off[s+1]).
    #: None = single range.  Produced by the distributed segmented merge.
    seg_offsets: np.ndarray | None = None
    #: probe-position family: "km" = Kirsch–Mitzenmacher double hashing
    #: over the input hash (native); "nthash" = published ntHash NTM64
    #: positions over NTC64 base values (DNA ``.bf`` interop — inputs must
    #: then be NTC64 hashes from sketch.nthash.batch_ntc64).
    hash_family: str = "km"
    #: k-mer size for the nthash family (NTM64's multiplier uses k)
    nt_k: int = 0

    def __post_init__(self) -> None:
        if self.hash_family not in ("km", "nthash"):
            raise ValueError(f"unknown hash family {self.hash_family!r}")
        if self.hash_family == "nthash":
            if self.block_bits:
                raise ValueError("nthash family requires the classic layout")
            if self.nt_k < 1:
                raise ValueError("nthash family requires nt_k (the k-mer size)")
        if self.m_bits % 64:
            raise ValueError("m_bits must be a multiple of 64")
        if self.seg_offsets is not None:
            if self.block_bits != 64:
                raise ValueError("seg_offsets requires the 64-bit word layout")
            self.seg_offsets = np.asarray(self.seg_offsets, dtype=np.int64)
            S = len(self.seg_offsets) - 1
            if S < 1 or S & (S - 1):
                raise ValueError("segment count must be a power of two")
            if self.seg_offsets[0] != 0 or self.seg_offsets[-1] != self.m_bits // 64:
                raise ValueError("seg_offsets must span [0, m_bits/64]")
        if self.block_bits:
            if self.block_bits & (self.block_bits - 1):
                raise ValueError("block_bits must be a power of two")
            if self.m_bits % self.block_bits:
                raise ValueError("m_bits must be a multiple of block_bits")
            bpb = self.block_bits.bit_length() - 1
            if self.num_hashes * bpb > 64:
                raise ValueError("num_hashes*log2(block_bits) must fit in 64 bits")
        if self.bits is None:
            self.bits = np.zeros(self.m_bits // 8, dtype=np.uint8)
        else:
            self.bits = np.asarray(self.bits, dtype=np.uint8)
            if self.bits.shape[0] != self.m_bits // 8:
                raise ValueError("bitmap length does not match m_bits")

    # -- construction -----------------------------------------------------
    @classmethod
    def for_capacity(
        cls, n_entries: int, fpr: float, num_hashes: int | None = None, block_bits: int = 0
    ) -> "BloomSketch":
        h, block_bits = resolve_block_layout(fpr, num_hashes, block_bits)
        if block_bits:
            m = blocked_size_bits(n_entries, fpr, h, block_bits)
        else:
            m = optimal_size_bits(n_entries, fpr, h)
        return cls(m_bits=m, num_hashes=h, block_bits=block_bits)

    def _words(self) -> np.ndarray:
        """uint64 view over the bit array (64-bit layout fast paths)."""
        try:
            return self.bits.view(np.uint64)
        except ValueError:  # unaligned zero-copy buffer → one-time copy
            self.bits = self.bits.copy()
            return self.bits.view(np.uint64)

    def _probe_words(self, h2: np.ndarray) -> np.ndarray:
        """See module-level ``probe_words64`` (kept as a method alias so all
        call sites share one implementation)."""
        return probe_words64(h2, self.num_hashes)

    def _blocked_positions(self, h1: np.ndarray, h2: np.ndarray):
        """Yield bit positions (int64) per hash fn, all within h1's block.

        Offset slices skip the low 64 % bpb h2 bits (bit 0 is forced odd by
        km_probe — see _probe_words).
        """
        n_blocks = self.m_bits // self.block_bits
        bpb = self.block_bits.bit_length() - 1
        shift = 64 % bpb
        base = (h1 % np.uint64(n_blocks)).astype(np.int64) * np.int64(self.block_bits)
        off_mask = np.uint64(self.block_bits - 1)
        for i in range(self.num_hashes):
            off = ((h2 >> np.uint64(bpb * i + shift)) & off_mask).astype(np.int64)
            yield base + off

    def _positions(self, h1: np.ndarray, h2: np.ndarray):
        if self.block_bits:
            return self._blocked_positions(h1, h2)
        return km_indices_iter(h1, h2, self.num_hashes, self.m_bits)

    # -- update -----------------------------------------------------------
    def update_batch(self, hashes: np.ndarray, assume_unique: bool = False) -> int:
        """Insert a batch of 64-bit frame hashes; returns # already present.

        Mirrors insertAndCheck (BloomFilterGenerator.h:170-178): an item is
        "redundant" iff all h bits were already set before this insert.
        Duplicate items *within* the batch are resolved sequentially-exactly
        by a first-occurrence pass (np.unique), matching scan-order behavior.
        ``assume_unique=True`` skips that sort when the caller already
        deduplicated (the merge path feeds pre-uniqued sparse unions —
        re-sorting 10^7 hashes per merge task was pure waste).
        """
        if hashes.size == 0:
            return 0
        # first occurrences: a repeated hash within the batch is redundant
        uniq = hashes if assume_unique else np.unique(hashes)
        if self.hash_family == "nthash":
            from .nthash import nt_positions

            present = np.ones(uniq.size, dtype=bool)
            for idx in nt_positions(uniq, self.nt_k, self.num_hashes, self.m_bits):
                byte_i = idx >> 3
                bit_m = _BIT_LUT[idx & 7]
                present &= (self.bits[byte_i] & bit_m) != 0
                np.bitwise_or.at(self.bits, byte_i, bit_m)
            n_uniq_new = int((~present).sum())
            self.n_inserted += int(hashes.size)
            self.n_new += n_uniq_new
            n_red = int(hashes.size - n_uniq_new)
            self.n_redundant += n_red
            return n_red
        h1, h2 = km_probe(uniq)
        if self.block_bits == 64:
            words = self._words()
            widx = word_index64(h1, words.size, self.seg_offsets)
            pw = self._probe_words(h2)
            present = (words[widx] & pw) == pw
            # np.unique output is sorted and fastrange is monotone, so the
            # sorted-scatter fast path applies on every dedup'd batch; the
            # .at fallback only fires for explicitly unsorted assume_unique
            # input
            if widx.size < 2 or bool((widx[1:] >= widx[:-1]).all()):
                or_scatter_sorted(words, widx, pw)
            else:
                np.bitwise_or.at(words, widx, pw)
        else:
            present = np.ones(uniq.size, dtype=bool)
            for idx in self._positions(h1, h2):
                byte_i = idx >> 3
                bit_m = _BIT_LUT[idx & 7]
                present &= (self.bits[byte_i] & bit_m) != 0
                np.bitwise_or.at(self.bits, byte_i, bit_m)
        n_uniq_new = int((~present).sum())
        n_red = int(hashes.size - n_uniq_new)
        self.n_inserted += int(hashes.size)
        self.n_new += n_uniq_new
        self.n_redundant += n_red
        return n_red

    # -- query ------------------------------------------------------------
    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool array, True iff all h bits set
        (contains call sites /root/reference/Common/SeqEval.h:54,79,158)."""
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        if self.hash_family == "nthash":
            from .nthash import nt_positions

            hit = np.ones(hashes.size, dtype=bool)
            for idx in nt_positions(hashes, self.nt_k, self.num_hashes, self.m_bits):
                hit &= (self.bits[idx >> 3] & _BIT_LUT[idx & 7]) != 0
            return hit
        h1, h2 = km_probe(hashes)
        return self.contains_probe(h1, h2)

    def contains_probe(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Membership given a precomputed K-M probe pair — lets the
        categorizer hash each batch once and test against every filter.

        Survivor compaction: after each probe level only still-alive
        candidates are gathered forward.  Non-members die off ~occupancy
        per level, cutting random DRAM touches from h*n to ~2*n — the
        bandwidth bottleneck at high core counts.
        """
        n = h1.size
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return out
        bits = self.bits
        if self.block_bits == 64:
            words = self._words()
            widx = word_index64(h1, words.size, self.seg_offsets)
            got = words[widx]  # the only gather
            pw = self._probe_words(h2)
            return (got & pw) == pw
        if self.block_bits:
            n_blocks = self.m_bits // self.block_bits
            bpb = self.block_bits.bit_length() - 1
            shift = 64 % bpb
            off_mask = np.uint64(self.block_bits - 1)
            base = (h1 % np.uint64(n_blocks)).astype(np.int64) * np.int64(self.block_bits)
            rest = h2
            alive = None
            for level in range(self.num_hashes):
                idx = base + ((rest >> np.uint64(bpb * level + shift)) & off_mask).astype(np.int64)
                test = (bits[idx >> 3] & _BIT_LUT[idx & 7]) != 0
                keep = np.flatnonzero(test)
                alive = keep if alive is None else alive[keep]
                if alive.size == 0:
                    return out
                if level + 1 < self.num_hashes:
                    base = base[keep]
                    rest = rest[keep]
            out[alive] = True
            return out
        m = np.int64(self.m_bits)
        idx = (h1 % np.uint64(self.m_bits)).astype(np.int64)
        step = (h2 % np.uint64(self.m_bits)).astype(np.int64)
        alive = None  # None means "all positions"
        for level in range(self.num_hashes):
            test = (bits[idx >> 3] & _BIT_LUT[idx & 7]) != 0
            keep = np.flatnonzero(test)
            alive = keep if alive is None else alive[keep]
            if alive.size == 0:
                return out
            if level + 1 < self.num_hashes:
                idx = idx[keep] + step[keep]
                idx[idx >= m] -= m
                step = step[keep]
        out[alive] = True
        return out

    # -- merge ------------------------------------------------------------
    def merge(self, other: "BloomSketch") -> "BloomSketch":
        """Associative/commutative/idempotent OR-merge; counters add.

        NOTE merged ``n_new``/``n_redundant`` are scan-order artifacts (a
        frame first-seen in two partitions counts "new" twice) — exactly the
        delta documented in SURVEY.md §7.4; pair with an HLL for exact-ish
        distinct counts. ``popcount``-derived stats stay exact.
        """
        same_seg = (self.seg_offsets is None) == (other.seg_offsets is None) and (
            self.seg_offsets is None
            or np.array_equal(self.seg_offsets, other.seg_offsets)
        )
        if (self.m_bits, self.num_hashes, self.block_bits, self.hash_family, self.nt_k) != (
            other.m_bits,
            other.num_hashes,
            other.block_bits,
            other.hash_family,
            other.nt_k,
        ) or not same_seg:
            raise ValueError("cannot merge Bloom sketches with different params")
        return BloomSketch(
            m_bits=self.m_bits,
            num_hashes=self.num_hashes,
            bits=np.bitwise_or(self.bits, other.bits),
            n_inserted=self.n_inserted + other.n_inserted,
            n_new=self.n_new + other.n_new,
            n_redundant=self.n_redundant + other.n_redundant,
            block_bits=self.block_bits,
            seg_offsets=self.seg_offsets,
            hash_family=self.hash_family,
            nt_k=self.nt_k,
        )

    # -- stats ------------------------------------------------------------
    def popcount(self) -> int:
        return int(_POPCNT8[self.bits].sum(dtype=np.int64))

    def occupancy(self) -> float:
        return self.popcount() / self.m_bits

    def fpr_from_occupancy(self) -> float:
        """Exact expected FPR for a random non-member given the *observed*
        bit pattern.

        Classic layout: all h probes uniform over the whole array →
        ``(set/m)^h``.  Blocked layouts concentrate all h probes in the one
        block selected by h1, so block-occupancy variance matters: the h
        probe offsets are independent uniform within the block, hence
        P(false positive | block b) = (popcount(b)/B)^h and the global FPR
        is the mean over blocks — E[(c_b/B)^h] >> (E[c_b]/B)^h under load
        variance (Putze et al. 2007 §4).  The global-occupancy formula
        underestimated blocked FPR ~7x; this feeds the binomial kernel's
        min_count, so it must be the real probe-level FPR.
        """
        if not self.block_bits:
            return self.occupancy() ** self.num_hashes
        bytes_per_block = self.block_bits // 8
        per_block = (
            _POPCNT8[self.bits]
            .reshape(-1, bytes_per_block)
            .sum(axis=1, dtype=np.int64)
        )
        frac = per_block.astype(np.float64) / float(self.block_bits)
        return float(np.mean(frac**self.num_hashes))

    def approx_fpr(self) -> float:
        """Reference's formula on the merged new-entry count."""
        return approx_fpr(self.m_bits, self.n_new, self.num_hashes)

    def redundancy_fpr(self, n_entries: int | None = None) -> float:
        """Mean incremental FPR over n inserts (BloomFilterInfo.cpp:183-204):
        average of approx_fpr(i) for i=1..n, computed by trapezoidal
        integral approximation (reference iterates; closed loop is O(n))."""
        n = self.n_new if n_entries is None else n_entries
        if n <= 0:
            return 0.0
        steps = min(n, 1024)
        xs = np.linspace(1, n, steps)
        vals = [approx_fpr(self.m_bits, int(x), self.num_hashes) for x in xs]
        return float(np.mean(vals))

    # -- serde ------------------------------------------------------------
    def serialize(self) -> bytes:
        """Raw little-endian bit dump, the analog of the ``.bf`` file whose
        size equals the 64-rounded bit array (Tests/BloomFilterTests.cpp:67-78);
        metadata travels separately (registry struct, BloomFilterInfo analog).
        """
        return self.bits.tobytes()

    @classmethod
    def deserialize(
        cls,
        payload: bytes,
        m_bits: int,
        num_hashes: int,
        copy: bool = True,
        block_bits: int = 0,
        **counters,
    ) -> "BloomSketch":
        """``copy=False`` gives a zero-copy read-only view — use for
        probe-only consumers (the categorizer re-materializing a 10 MB
        bitmap per Arrow batch is pure memcpy waste)."""
        arr = np.frombuffer(payload, dtype=np.uint8)
        return cls(
            m_bits=m_bits,
            num_hashes=num_hashes,
            bits=arr.copy() if copy else arr,
            block_bits=block_bits,
            **counters,
        )
