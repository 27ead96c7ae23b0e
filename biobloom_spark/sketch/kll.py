"""KLL quantile sketch (Karnin, Lang, Liberty, FOCS 2016).

North-rule companion for document-length quantiles alongside the t-digest.
Compactor-stack design: level h holds items each representing 2^h inputs;
an over-full level sorts itself and promotes every other item upward.

This implementation uses the *deterministic* alternating-offset compaction
(flips parity per compaction instead of a coin flip) so merge-order property
tests are reproducible; the classic randomized variant has the same bound in
expectation.  Normalized rank error for the default k is well under 1.5%.

Merge: level-wise concatenation then compaction — associative in
distribution; estimates (not bytes) are the tested contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_C = 2.0 / 3.0  # capacity decay per level below the top


@dataclass
class KLLSketch:
    k: int = 200
    compactors: list = field(default_factory=list)  # list[np.ndarray float64]
    n: int = 0
    _parity: int = 0

    def __post_init__(self) -> None:
        if not self.compactors:
            self.compactors = [np.empty(0, dtype=np.float64)]
        else:
            self.compactors = [np.asarray(c, dtype=np.float64) for c in self.compactors]

    def _capacity(self, h: int) -> int:
        depth = len(self.compactors) - 1 - h
        return max(2, int(np.ceil(self.k * (_C**depth))))

    def update_batch(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self.n += int(values.size)
        self.compactors[0] = np.concatenate([self.compactors[0], values])
        self._compact_all()

    def _compact_all(self) -> None:
        h = 0
        while h < len(self.compactors):
            if self.compactors[h].size > self._capacity(h):
                if h + 1 == len(self.compactors):
                    self.compactors.append(np.empty(0, dtype=np.float64))
                buf = np.sort(self.compactors[h], kind="stable")
                off = self._parity & 1
                self._parity += 1
                promoted = buf[off::2]
                # odd tail stays at this level
                leftover = buf[1 - off :: 2][promoted.size :]
                self.compactors[h] = leftover.astype(np.float64)
                self.compactors[h + 1] = np.concatenate([self.compactors[h + 1], promoted])
            h += 1

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if self.k != other.k:
            raise ValueError("cannot merge KLL sketches with different k")
        out = KLLSketch(k=self.k, n=self.n + other.n, _parity=self._parity ^ other._parity)
        levels = max(len(self.compactors), len(other.compactors))
        out.compactors = []
        for h in range(levels):
            a = self.compactors[h] if h < len(self.compactors) else np.empty(0)
            b = other.compactors[h] if h < len(other.compactors) else np.empty(0)
            out.compactors.append(np.concatenate([a, b]).astype(np.float64))
        out._compact_all()
        return out

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, c in enumerate(self.compactors):
            if c.size:
                vals.append(c)
                wts.append(np.full(c.size, float(1 << h)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        j = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(j, v.size - 1)])

    def rank(self, value: float) -> float:
        """Normalized rank estimate of value in [0,1]."""
        v, w = self._weighted_items()
        if v.size == 0:
            return float("nan")
        mask = v <= value
        return float(w[mask].sum() / w.sum())

    def error_bound(self) -> float:
        """Approx normalized rank error (randomized bound ~1.7/k·sqrt levels)."""
        return max(3.0 / self.k, 0.005)

    def serialize(self) -> bytes:
        parts = [np.asarray([float(self.k), float(self.n), float(self._parity), float(len(self.compactors))])]
        for c in self.compactors:
            parts.append(np.asarray([float(c.size)]))
            parts.append(c)
        return np.concatenate(parts).tobytes()

    @classmethod
    def deserialize(cls, payload: bytes) -> "KLLSketch":
        arr = np.frombuffer(payload, dtype=np.float64)
        k, n, parity, levels = int(arr[0]), int(arr[1]), int(arr[2]), int(arr[3])
        pos = 4
        comps = []
        for _ in range(levels):
            sz = int(arr[pos])
            pos += 1
            comps.append(arr[pos : pos + sz].copy())
            pos += sz
        return cls(k=k, compactors=comps, n=n, _parity=parity)
