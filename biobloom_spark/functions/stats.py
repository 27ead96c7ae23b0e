"""Binomial tail math for the BINOMIAL scoring kernel — scipy-free.

Re-implements, from the published definition, the reference's minimum-hit
threshold: the smallest hit count c such that the probability of seeing >= c
hits from pure false positives is below the significance bound
(/root/reference/Common/SeqEval.h:199-216 uses
``quantile(complement(binomial(frames, fpr), minFPR))`` with an
integer_round_up policy; CLI ``-s`` is ``-10*log10(minFPR)``, default 100 →
1e-10, /root/reference/BioBloomCategorizer/BioBloomCategorizer.cpp:419-421).

Survival function via the regularized incomplete beta
``P(X >= c) = I_p(c, n - c + 1)`` computed with a Lentz continued fraction +
``math.lgamma`` (no scipy in the environment).
"""

from __future__ import annotations

import math
from functools import lru_cache

__all__ = ["log_betainc", "betainc", "binom_sf", "min_count", "score_to_fpr"]

_MAX_ITER = 300
_TINY = 1e-300
_EPS = 3e-14


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for incomplete beta (Lentz's algorithm)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _TINY:
        d = _TINY
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _TINY:
            d = _TINY
        c = 1.0 + aa / c
        if abs(c) < _TINY:
            c = _TINY
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _TINY:
            d = _TINY
        c = 1.0 + aa / c
        if abs(c) < _TINY:
            c = _TINY
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def log_betainc(a: float, b: float, x: float) -> float:
    """log of the regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return -math.inf
    if x >= 1.0:
        return 0.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    if x < (a + 1.0) / (a + b + 2.0):
        return ln_front + math.log(_betacf(a, b, x) / a)
    # symmetry: I_x(a,b) = 1 - I_{1-x}(b,a); flipped CF converges here
    other = math.exp(ln_front) * _betacf(b, a, 1.0 - x) / b
    val = 1.0 - other
    if val <= 0.0:
        return -math.inf
    return math.log(val)


def betainc(a: float, b: float, x: float) -> float:
    return math.exp(log_betainc(a, b, x))


def binom_sf(c: int, n: int, p: float) -> float:
    """P(X >= c) for X ~ Binomial(n, p)."""
    if c <= 0:
        return 1.0
    if c > n:
        return 0.0
    return betainc(float(c), float(n - c + 1), p)


def log_binom_sf(c: int, n: int, p: float) -> float:
    if c <= 0:
        return 0.0
    if c > n:
        return -math.inf
    return log_betainc(float(c), float(n - c + 1), p)


@lru_cache(maxsize=1 << 20)
def min_count(frames: int, fpr: float, alpha: float) -> int:
    """Smallest c with P(Binomial(frames, fpr) >= c) < alpha.

    Binary search on the (monotone) survival function; memoized per
    (frames, fpr, alpha) — the precomputation the reference performs lazily
    per frame count (/root/reference/BioBloomCategorizer/
    MIBFClassifier.hpp:778-786) and, wastefully, per read in SeqEval.h:225.
    """
    if frames <= 0:
        return 1  # unreachable threshold → no-match, matching 0-frame guard
    lo, hi = 0, frames + 1
    while lo < hi:
        mid = (lo + hi) // 2
        if binom_sf(mid, frames, fpr) < alpha:
            hi = mid
        else:
            lo = mid + 1
    return lo


def score_to_fpr(score: float) -> float:
    """CLI ``-s`` semantics: score = -10*log10(minFPR)
    (/root/reference/BioBloomCategorizer/BioBloomCategorizer.cpp:419-421)."""
    return 10.0 ** (-score / 10.0)
