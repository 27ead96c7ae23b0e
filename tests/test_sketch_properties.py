"""Hypothesis property tests for the mergeable companion sketches.

The north rule requires merge associativity and published error bounds as
*properties*, not spot checks — these tests drive the pure-numpy sketch
kernels (no Spark) over randomized inputs and partitionings.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from biobloom_spark.sketch import (
    CountMinSketch,
    HLLSketch,
    KLLSketch,
    TDigestSketch,
)

_SETTINGS = dict(max_examples=40, deadline=None)


def _hashes(seed: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=n, dtype=np.uint64)


def _split(arr: np.ndarray, cuts: list[float]) -> list[np.ndarray]:
    idx = sorted({int(c * arr.size) for c in cuts})
    return [p for p in np.split(arr, idx)]


splits = st.lists(st.floats(0.05, 0.95), min_size=1, max_size=4)


class TestHLLProperties:
    @given(seed=st.integers(0, 2**31), n=st.integers(1, 20000), cuts=splits)
    @settings(**_SETTINGS)
    def test_merge_partition_invariance(self, seed, n, cuts):
        """Any partitioning of the input merges to the same registers as
        one-shot updates (max is associative+commutative+idempotent)."""
        h = _hashes(seed, n)
        one = HLLSketch(p=10)
        one.update_batch(h)
        parts = _split(h, cuts)
        acc = HLLSketch(p=10)
        for p in parts:
            s = HLLSketch(p=10)
            s.update_batch(p)
            acc = acc.merge(s)
        assert np.array_equal(acc.registers, one.registers)

    @given(seed=st.integers(0, 2**31), n=st.integers(100, 50000))
    @settings(**_SETTINGS)
    def test_estimate_within_bound(self, seed, n):
        h = np.unique(_hashes(seed, n))
        s = HLLSketch(p=14)
        s.update_batch(h)
        tol = 4 * 1.04 / np.sqrt(2**14)  # 4 sigma: hypothesis samples many
        assert abs(s.estimate() - h.size) <= tol * h.size

    @given(seed=st.integers(0, 2**31), n=st.integers(1, 5000))
    @settings(**_SETTINGS)
    def test_self_merge_idempotent(self, seed, n):
        s = HLLSketch(p=10)
        s.update_batch(_hashes(seed, n))
        assert np.array_equal(s.merge(s).registers, s.registers)


class TestCMSProperties:
    @given(seed=st.integers(0, 2**31), n=st.integers(1, 20000), cuts=splits)
    @settings(**_SETTINGS)
    def test_merge_partition_invariance(self, seed, n, cuts):
        """Counter tables add: any partitioning merges to the one-shot
        table exactly."""
        h = _hashes(seed, n) % 500  # force collisions
        one = CountMinSketch(width=256, depth=3)
        one.update_batch(h.astype(np.uint64))
        acc = CountMinSketch(width=256, depth=3)
        for p in _split(h, cuts):
            s = CountMinSketch(width=256, depth=3)
            s.update_batch(p.astype(np.uint64))
            acc = acc.merge(s)
        assert np.array_equal(acc.table, one.table)

    @given(seed=st.integers(0, 2**31), n=st.integers(100, 20000))
    @settings(**_SETTINGS)
    def test_never_undercounts_and_bound(self, seed, n):
        keys = (_hashes(seed, n) % 200).astype(np.uint64)
        s = CountMinSketch(width=256, depth=5)
        s.update_batch(keys)
        uniq, true = np.unique(keys, return_counts=True)
        est = s.query_batch(uniq)
        assert (est >= true).all()
        # e/width overcount bound, 4x slack for the e^-depth tail across
        # the many hypothesis examples
        assert (est - true).max() <= 4 * (np.e / 256) * n


class TestKLLProperties:
    @given(seed=st.integers(0, 2**31), n=st.integers(50, 20000), cuts=splits)
    @settings(**_SETTINGS)
    def test_merged_rank_error_bounded(self, seed, n, cuts):
        rng = np.random.default_rng(seed)
        vals = rng.normal(size=n)
        acc = KLLSketch()
        for p in _split(vals, cuts):
            s = KLLSketch()
            s.update_batch(p)
            acc = acc.merge(s)
        assert acc.n == n
        srt = np.sort(vals)
        for q in (0.1, 0.5, 0.9):
            v = acc.quantile(q)
            rank = np.searchsorted(srt, v, side="right") / n
            assert abs(rank - q) <= 2 * acc.error_bound() + 1.0 / n

    @given(seed=st.integers(0, 2**31), n=st.integers(50, 5000))
    @settings(**_SETTINGS)
    def test_n_adds_under_merge(self, seed, n):
        vals = np.random.default_rng(seed).normal(size=n)
        a, b = KLLSketch(), KLLSketch()
        a.update_batch(vals[: n // 2])
        b.update_batch(vals[n // 2 :])
        assert a.merge(b).n == n


class TestTDigestProperties:
    @given(seed=st.integers(0, 2**31), n=st.integers(50, 20000), cuts=splits)
    @settings(**_SETTINGS)
    def test_merged_rank_error_bounded(self, seed, n, cuts):
        rng = np.random.default_rng(seed)
        vals = rng.exponential(size=n)
        acc = TDigestSketch()
        for p in _split(vals, cuts):
            s = TDigestSketch()
            s.update_batch(p)
            acc = acc.merge(s)
        assert acc.total_weight == pytest.approx(n)
        srt = np.sort(vals)
        for q in (0.1, 0.5, 0.9):
            v = acc.quantile(q)
            rank = np.searchsorted(srt, v, side="right") / n
            assert abs(rank - q) <= 2.0 / 200.0 + 1.0 / n  # one centroid/side

    @given(seed=st.integers(0, 2**31), n=st.integers(10, 2000))
    @settings(**_SETTINGS)
    def test_extremes_exact(self, seed, n):
        """t-digest keeps min/max exactly (singleton edge centroids)."""
        vals = np.random.default_rng(seed).normal(size=n)
        s = TDigestSketch()
        s.update_batch(vals)
        assert s.quantile(0.0) == pytest.approx(vals.min())
        assert s.quantile(1.0) == pytest.approx(vals.max())


class TestSerializationRoundtrip:
    @given(seed=st.integers(0, 2**31), n=st.integers(1, 5000))
    @settings(max_examples=20, deadline=None)
    def test_all_sketches_roundtrip(self, seed, n):
        h = _hashes(seed, n)
        vals = np.random.default_rng(seed).normal(size=min(n, 1000))
        hll = HLLSketch(p=10); hll.update_batch(h)
        cms = CountMinSketch(width=128, depth=3); cms.update_batch(h % 100)
        kll = KLLSketch(); kll.update_batch(vals)
        td = TDigestSketch(); td.update_batch(vals)
        assert np.array_equal(
            HLLSketch.deserialize(hll.serialize(), p=10).registers, hll.registers
        )
        assert np.array_equal(
            CountMinSketch.deserialize(cms.serialize(), 128, 3).table, cms.table
        )
        k2 = KLLSketch.deserialize(kll.serialize())
        assert k2.n == kll.n
        assert k2.quantile(0.5) == kll.quantile(0.5)
        t2 = TDigestSketch.deserialize(td.serialize())
        assert t2.quantile(0.5) == pytest.approx(td.quantile(0.5))


class TestWireFormatProperties:
    """Property roundtrips for the two round-4 shuffle wire formats: the
    6-byte-delta slice-hash pack (build partials) and the 8-byte/claim
    miBF claims pack.  Arbitrary sorted-unique inputs, any density —
    including the fallback boundary at 48-bit deltas."""

    @given(
        seed=st.integers(0, 2**31),
        n=st.integers(0, 5000),
        span_bits=st.integers(8, 58),
        seg=st.integers(0, 63),
    )
    @settings(max_examples=40, deadline=None)
    def test_slice_hash_pack_roundtrip(self, seed, n, span_bits, seg):
        from biobloom_spark.operators.maker import (
            _pack_slice_hashes,
            _unpack_slice_hashes,
        )

        base = np.uint64(seg) << np.uint64(58)
        rng = np.random.default_rng(seed)
        u = np.unique(
            base + rng.integers(0, 1 << span_bits, size=n, dtype=np.uint64)
        ).astype(np.uint64)
        blob = _pack_slice_hashes(u, base)
        assert blob[:1] in (b"Q", b"R")
        out = _unpack_slice_hashes(blob, base)
        assert out.dtype == np.uint64
        assert np.array_equal(out, u)

    @given(
        seed=st.integers(0, 2**31),
        n=st.integers(0, 5000),
        span_bits=st.integers(4, 62),
        n_labels=st.integers(1, 200),
    )
    @settings(max_examples=40, deadline=None)
    def test_claims_pack_roundtrip(self, seed, n, span_bits, n_labels):
        from biobloom_spark.sketch.mibf import MIBFClaims, _recompute_ties

        rng = np.random.default_rng(seed)
        slots = np.unique(
            rng.integers(0, 1 << span_bits, size=n, dtype=np.int64)
        )
        labels = rng.integers(1, n_labels + 1, size=slots.size).astype(np.uint16)
        c = MIBFClaims(slots, _recompute_ties(slots, labels))
        d = MIBFClaims.deserialize(c.serialize())
        assert np.array_equal(d.slots, c.slots)
        assert np.array_equal(d.ties, c.ties)

    @given(seed=st.integers(0, 2**31), n=st.integers(1, 2000), parts=st.integers(1, 8))
    @settings(max_examples=25, deadline=None)
    def test_claims_merge_invariant_under_wire_roundtrip(self, seed, n, parts):
        """merge_all(serialize∘deserialize(parts)) == merge_all(parts):
        the wire format must never change ownership resolution."""
        from biobloom_spark.sketch.mibf import MIBFClaims, _recompute_ties

        rng = np.random.default_rng(seed)
        sets = []
        for i in range(parts):
            slots = np.unique(rng.integers(0, 1 << 24, size=n, dtype=np.int64))
            labels = rng.integers(1, 50, size=slots.size).astype(np.uint16)
            sets.append(MIBFClaims(slots, _recompute_ties(slots, labels)))
        direct = MIBFClaims.merge_all(sets)
        wired = MIBFClaims.merge_all(
            [MIBFClaims.deserialize(s.serialize()) for s in sets]
        )
        assert np.array_equal(direct.slots, wired.slots)
        assert np.array_equal(direct.ties, wired.ties)
