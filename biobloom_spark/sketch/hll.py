"""HyperLogLog sketch — per-filter distinct-frame cardinality.

North-rule companion sketch (no reference counterpart; the reference tracks
exact ``totalEntries`` single-node, /root/reference/BioBloomMaker/
BloomFilterGenerator.h:175-178, which does not merge — HLL is the mergeable
replacement).  Registers are standard HLL (Flajolet et al. 2007); the
estimator is Ertl's improved estimator ("New cardinality estimation
algorithms for HyperLogLog sketches", 2017, §4: the closed-form τ/σ
corrections applied to the full register histogram).  Unlike the classic
raw-estimate + linear-counting-below-2.5m scheme, it has no threshold
cutover and no bias hump in the transition region (~2.5m-5m distinct),
so the relative error stays ≈ 1.04/sqrt(2^p) across the whole range —
the round-5 hypothesis fuzzer caught the classic estimator +4.8% off at
n≈2.4m, exactly the textbook hump this replaces.

Merge = elementwise register max → associative, commutative, idempotent
(the estimator change touches read-out only; serialized bytes and merge
semantics are unchanged).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .hashing import splitmix64

_ALPHA_INF = 1.0 / (2.0 * math.log(2.0))


def _sigma(x: float) -> float:
    """Ertl 2017 σ(x) = x + Σ_k x^(2^k)·2^(k-1) (linear-counting limit)."""
    if x == 1.0:
        return float("inf")
    y, z = 1.0, x
    while True:
        x = x * x
        z_new = z + x * y
        y += y
        if z_new == z:
            return z
        z = z_new


def _tau(x: float) -> float:
    """Ertl 2017 τ(x) (saturated-register correction)."""
    if x == 0.0 or x == 1.0:
        return 0.0
    y, z = 1.0, 1.0 - x
    while True:
        x = math.sqrt(x)
        z_prev = z
        y *= 0.5
        z -= (1.0 - x) ** 2 * y
        if z == z_prev:
            return z / 3.0


@dataclass
class HLLSketch:
    p: int = 14  # 2^14 registers → ~0.8% error, 16 KiB
    registers: np.ndarray = field(default=None)  # uint8[2^p]

    def __post_init__(self) -> None:
        m = 1 << self.p
        if self.registers is None:
            self.registers = np.zeros(m, dtype=np.uint8)
        else:
            self.registers = np.asarray(self.registers, dtype=np.uint8)
            if self.registers.shape[0] != m:
                raise ValueError("register count != 2^p")

    def update_batch(self, hashes: np.ndarray) -> None:
        if hashes.size == 0:
            return
        h = splitmix64(hashes ^ np.uint64(0xA5A5A5A5A5A5A5A5))
        reg = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # low 64-p bits shifted up
        # rank = leading zeros of rest (within 64-p bits) + 1
        lz = np.full(h.shape, 64 - self.p, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # leading zeros via float64 exponent trick is lossy; use bit loop
            v = rest[nz]
            cnt = np.zeros(v.shape, dtype=np.uint8)
            for shift in (32, 16, 8, 4, 2, 1):
                mask = v < (np.uint64(1) << np.uint64(64 - shift))
                cnt[mask] += np.uint8(shift)
                v[mask] = v[mask] << np.uint64(shift)
            lz_nz = np.minimum(cnt, 64 - self.p)
            lz[nz] = lz_nz
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, reg, rank)

    def merge(self, other: "HLLSketch") -> "HLLSketch":
        if self.p != other.p:
            raise ValueError("cannot merge HLLs with different precision")
        return HLLSketch(p=self.p, registers=np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        """Ertl's improved estimator over the register histogram: no
        threshold cutover, no transition-region bias (module docstring)."""
        m = 1 << self.p
        q = 64 - self.p  # register values range 0..q+1
        hist = np.bincount(self.registers, minlength=q + 2)
        z = m * _tau(1.0 - int(hist[q + 1]) / m)
        for k in range(q, 0, -1):
            z = 0.5 * (z + float(hist[k]))
        z += m * _sigma(int(hist[0]) / m)
        return float(_ALPHA_INF * m * m / z)

    def relative_error_bound(self) -> float:
        return 1.04 / np.sqrt(1 << self.p)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, payload: bytes, p: int = 14) -> "HLLSketch":
        return cls(p=p, registers=np.frombuffer(payload, dtype=np.uint8).copy())
