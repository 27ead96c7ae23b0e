"""HyperLogLog sketch — per-filter distinct-frame cardinality.

North-rule companion sketch (no reference counterpart; the reference tracks
exact ``totalEntries`` single-node, /root/reference/BioBloomMaker/
BloomFilterGenerator.h:175-178, which does not merge — HLL is the mergeable
replacement).  Standard HLL (Flajolet et al. 2007) with linear-counting
small-range correction; relative error ≈ 1.04/sqrt(2^p).

Merge = elementwise register max → associative, commutative, idempotent.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .hashing import splitmix64

_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


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
        m = 1 << self.p
        regs = self.registers.astype(np.float64)
        est = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return float(m * np.log(m / zeros))
        return float(est)

    def relative_error_bound(self) -> float:
        return 1.04 / np.sqrt(1 << self.p)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, payload: bytes, p: int = 14) -> "HLLSketch":
        return cls(p=p, registers=np.frombuffer(payload, dtype=np.uint8).copy())
