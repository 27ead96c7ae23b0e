"""Merging t-digest — document-length quantiles (north-rule companion).

Dunning & Ertl, "Computing Extremely Accurate Quantiles Using t-Digests"
(arXiv:1902.04023), merging variant with the k1 (arcsine) scale function:
accuracy concentrates at the tails; centroid count bounded by the
compression parameter delta.

Merge: concatenate centroid lists, re-compress — associative up to the
documented re-compression tolerance (estimates, not bytes, are the
property-tested contract; see SURVEY.md §5(c)).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


def _k_fn(q: float, delta: float) -> float:
    return delta / (2.0 * math.pi) * math.asin(2.0 * min(max(q, 0.0), 1.0) - 1.0)


def _k_inv(k: float, delta: float) -> float:
    return (math.sin(k * 2.0 * math.pi / delta) + 1.0) / 2.0


@dataclass
class TDigestSketch:
    delta: float = 200.0
    means: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.float64))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.float64))
    d_min: float = math.inf
    d_max: float = -math.inf

    def __post_init__(self) -> None:
        self.means = np.asarray(self.means, dtype=np.float64)
        self.weights = np.asarray(self.weights, dtype=np.float64)

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())

    def update_batch(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self.d_min = min(self.d_min, float(values.min()))
        self.d_max = max(self.d_max, float(values.max()))
        self.means = np.concatenate([self.means, values])
        self.weights = np.concatenate([self.weights, np.ones(values.size)])
        # buffer compaction threshold: keep working set small
        if self.means.size > 8 * int(self.delta):
            self._compress()

    def _compress(self) -> None:
        if self.means.size == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = means[0], weights[0]
        w_so_far = 0.0
        k_limit = _k_fn(0.0, self.delta) + 1.0
        q_limit = _k_inv(k_limit, self.delta) * total
        for i in range(1, means.size):
            if w_so_far + cur_w + weights[i] <= q_limit:
                cur_m = (cur_m * cur_w + means[i] * weights[i]) / (cur_w + weights[i])
                cur_w += weights[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                k_limit = _k_fn(w_so_far / total, self.delta) + 1.0
                q_limit = _k_inv(k_limit, self.delta) * total
                cur_m, cur_w = means[i], weights[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def merge(self, other: "TDigestSketch") -> "TDigestSketch":
        if self.delta != other.delta:
            raise ValueError("cannot merge t-digests with different delta")
        return TDigestSketch.merge_all([self, other])

    @classmethod
    def merge_all(cls, digests: list, delta: float | None = None) -> "TDigestSketch":
        """K-way merge: concatenate every input's centroids and compress
        ONCE (Dunning & Ertl's merging-digest formulation).  Sequential
        pairwise merging re-compresses per step and compounds rank error
        with fan-in; this keeps one compression round per merge level, so
        a two-level reduction tree costs two rounds total regardless of
        how many partials feed it.

        ``delta`` sets the output compression; the common pattern for
        multi-level reductions is to hold intermediate levels at 2x the
        target delta (halving intermediate compression error) and compress
        to the target only at the final level.  Default: the smallest
        input delta."""
        if not digests:
            raise ValueError("merge_all needs at least one digest")
        if delta is None:
            delta = min(d.delta for d in digests)
        out = cls(
            delta=float(delta),
            means=np.concatenate([d.means for d in digests]),
            weights=np.concatenate([d.weights for d in digests]),
            d_min=min(d.d_min for d in digests),
            d_max=max(d.d_max for d in digests),
        )
        out._compress()
        return out

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return math.nan
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = min(max(q * total, 0.0), total)
        cumr = np.cumsum(self.weights)
        cuml = cumr - self.weights
        # Tie-aware interior rule (Dunning's convention): a centroid of
        # weight w covers ranks [left+0.5, right-0.5] at its own mean —
        # only the half-unit transition zones between adjacent centroids
        # interpolate.  Returning the mean inside the interior is what
        # makes heavily tied (discrete) distributions exact: a pure tie
        # block compresses to one centroid whose mean IS the tied value,
        # and midpoint interpolation would otherwise leak past the whole
        # tie mass.
        j = min(int(np.searchsorted(cumr, target, side="left")), self.means.size - 1)
        if self.weights[j] > 1 and cuml[j] + 0.5 <= target <= cumr[j] - 0.5:
            return float(self.means[j])
        # centroid midpoints in cumulative-weight space
        cum = cuml + self.weights / 2.0
        if target <= cum[0]:
            return float(self.d_min + (self.means[0] - self.d_min) * max(target, 0) / max(cum[0], 1e-12))
        if target >= cum[-1]:
            span = total - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 1.0
            return float(self.means[-1] + (self.d_max - self.means[-1]) * min(frac, 1.0))
        j = int(np.searchsorted(cum, target))
        frac = (target - cum[j - 1]) / (cum[j] - cum[j - 1])
        return float(self.means[j - 1] + (self.means[j] - self.means[j - 1]) * frac)

    def serialize(self) -> bytes:
        self._compress()
        header = np.asarray([self.delta, self.d_min, self.d_max, float(self.means.size)])
        return np.concatenate([header, self.means, self.weights]).tobytes()

    @classmethod
    def deserialize(cls, payload: bytes) -> "TDigestSketch":
        arr = np.frombuffer(payload, dtype=np.float64)
        delta, d_min, d_max, n = arr[0], arr[1], arr[2], int(arr[3])
        return cls(
            delta=float(delta),
            means=arr[4 : 4 + n].copy(),
            weights=arr[4 + n : 4 + 2 * n].copy(),
            d_min=float(d_min),
            d_max=float(d_max),
        )
