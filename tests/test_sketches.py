"""Property tests for the numpy sketch kernels (no Spark).

Mirrors the reference's unit-test strategy (insert/contains/store/load
round-trip, /root/reference/Tests/BloomFilterTests.cpp:40-145; sizing
invariants :67-78) and adds the merge-associativity + error-bound property
tests the north rule requires.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import pytest

from biobloom_spark.sketch import (
    BloomSketch,
    CountMinSketch,
    HLLSketch,
    KLLSketch,
    TDigestSketch,
    hash_tokens,
    optimal_hash_num,
    optimal_size_bits,
    shingle_hashes,
    splitmix64,
)


def _rand_hashes(n: int, seed: int) -> np.ndarray:
    # full-u64 uniform — models the engine's actual key universe (every
    # frame hash is a splitmix64 avalanche output).  The fastrange word
    # mapping (sketch.bloom.word_index64) consumes the HIGH bits, so a
    # 63-bit generator would un-physically halve the address space.
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


def _partitions(hashes: np.ndarray, cuts: list[int]):
    return np.array_split(hashes, cuts)


# ---------------------------------------------------------------- hashing
class TestHashing:
    def test_splitmix_deterministic_and_dispersed(self):
        x = np.arange(1000, dtype=np.uint64)
        a, b = splitmix64(x), splitmix64(x)
        assert np.array_equal(a, b)
        assert len(np.unique(a)) == 1000
        # avalanche: high bit should be ~50/50
        assert 300 < int((a >> np.uint64(63)).sum()) < 700

    def test_hash_tokens_stable_across_cache(self):
        toks = ["alpha", "beta", "alpha", "gamma"]
        h1 = hash_tokens(toks, cache={})
        h2 = hash_tokens(toks, cache=None)
        assert np.array_equal(h1, h2)
        assert h1[0] == h1[2]

    def test_shingle_window_count(self):
        # frame count = len - w + 1 (BloomFilterGenerator.h:131 analog)
        th = _rand_hashes(10, 1)
        assert shingle_hashes(th, 3).shape[0] == 8
        assert shingle_hashes(th[:2], 3).shape[0] == 0  # shorter than window

    def test_shingle_order_sensitivity(self):
        th = _rand_hashes(5, 2)
        rev = shingle_hashes(th[::-1].copy(), 3)
        fwd = shingle_hashes(th, 3)
        assert not np.array_equal(fwd, rev[::-1])


# ---------------------------------------------------------------- bloom
class TestBloom:
    def test_sizing_matches_reference_formulas(self):
        # BloomFilterInfo.h:57-76 — defaults p=0.0078125 → h=7
        assert optimal_hash_num(0.0078125) == 7
        m = optimal_size_bits(1000, 0.0078125, 7)
        assert m % 64 == 0
        raw = -1000 * 7 / math.log(1 - 0.0078125 ** (1 / 7))
        assert raw <= m < raw + 64 + 1

    def test_insert_contains_roundtrip(self):
        h = _rand_hashes(5000, 3)
        bf = BloomSketch.for_capacity(5000, 0.0078125)
        bf.update_batch(h)
        assert bf.contains_batch(h).all()

    def test_fpr_within_configured_bound(self):
        # the north rule's headline criterion: measured FPR <= configured
        n, p = 20000, 0.0078125
        train, probe = _rand_hashes(n, 4), _rand_hashes(4 * n, 5)
        bf = BloomSketch.for_capacity(n, p)
        bf.update_batch(train)
        train_set = set(train.tolist())
        novel = np.asarray([x for x in probe.tolist() if x not in train_set], dtype=np.uint64)
        measured = bf.contains_batch(novel).mean()
        assert measured <= p * 1.25  # sampling slack on 80k probes
        assert abs(bf.approx_fpr() - measured) < 0.01

    def test_insert_and_check_redundancy(self):
        # insertAndCheck semantics (BloomFilterGenerator.h:170-178)
        h = _rand_hashes(1000, 6)
        bf = BloomSketch.for_capacity(2000, 0.0078125)
        assert bf.update_batch(h) == 0 or bf.update_batch(h) >= 0
        red = bf.update_batch(h)  # identical batch → everything redundant
        assert red == 1000
        assert bf.n_redundant >= 1000

    def test_merge_associative_commutative_idempotent(self):
        h = _rand_hashes(9000, 7)
        parts = _partitions(h, [2000, 5000])
        mk = lambda arr: (lambda b: (b.update_batch(arr), b)[1])(
            BloomSketch(m_bits=64 * 2048, num_hashes=5)
        )
        a, b, c = (mk(p) for p in parts)
        left = a.merge(b).merge(c)
        right = a.merge(b.merge(c))
        swapped = c.merge(a).merge(b)
        whole = mk(h)
        assert np.array_equal(left.bits, right.bits)
        assert np.array_equal(left.bits, swapped.bits)
        assert np.array_equal(left.bits, whole.bits)  # bitmap == single-node build
        assert np.array_equal(left.merge(left).bits, left.bits)  # idempotent

    def test_serialize_roundtrip_and_size_invariant(self):
        # file size == bit-array bytes (Tests/BloomFilterTests.cpp:67-78)
        bf = BloomSketch(m_bits=64 * 128, num_hashes=4)
        bf.update_batch(_rand_hashes(100, 8))
        payload = bf.serialize()
        assert len(payload) == bf.m_bits // 8
        back = BloomSketch.deserialize(payload, bf.m_bits, bf.num_hashes)
        assert np.array_equal(back.bits, bf.bits)


# ---------------------------------------------------------------- hll
class TestHLL:
    def test_estimate_within_bound(self):
        for n in (500, 50_000, 300_000):
            h = _rand_hashes(n, n)
            s = HLLSketch(p=14)
            s.update_batch(h)
            err = abs(s.estimate() - n) / n
            assert err < 3 * s.relative_error_bound(), (n, err)

    def test_merge_matches_single_build_exactly(self):
        h = _rand_hashes(100_000, 11)
        parts = _partitions(h, [30_000, 60_000])
        sks = []
        for p_ in parts:
            s = HLLSketch(p=12)
            s.update_batch(p_)
            sks.append(s)
        merged = functools.reduce(lambda a, b: a.merge(b), sks)
        whole = HLLSketch(p=12)
        whole.update_batch(h)
        assert np.array_equal(merged.registers, whole.registers)
        m2 = sks[2].merge(sks[0]).merge(sks[1])  # commutative
        assert np.array_equal(m2.registers, whole.registers)

    def test_duplicates_do_not_inflate(self):
        h = np.tile(_rand_hashes(1000, 12), 50)
        s = HLLSketch(p=12)
        s.update_batch(h)
        assert abs(s.estimate() - 1000) / 1000 < 0.1

    def test_serde(self):
        s = HLLSketch(p=10)
        s.update_batch(_rand_hashes(5000, 13))
        back = HLLSketch.deserialize(s.serialize(), p=10)
        assert np.array_equal(back.registers, s.registers)


# ---------------------------------------------------------------- count-min
class TestCountMin:
    def test_overestimate_only_and_bounded(self):
        rng = np.random.default_rng(14)
        # zipfian token ids
        ids = rng.zipf(1.3, size=200_000) % 5000
        hashes = splitmix64(ids.astype(np.uint64))
        s = CountMinSketch(width=4096, depth=5)
        s.update_batch(hashes)
        uniq, true_counts = np.unique(hashes, return_counts=True)
        est = s.query_batch(uniq)
        assert (est >= true_counts).all()  # one-sided error
        assert (est - true_counts).max() <= s.error_bound()

    def test_merge_equals_single_build(self):
        h = _rand_hashes(50_000, 15) % np.uint64(1000)
        parts = _partitions(h, [20_000])
        sks = []
        for p_ in parts:
            s = CountMinSketch(width=1024, depth=4)
            s.update_batch(p_)
            sks.append(s)
        merged = sks[0].merge(sks[1])
        whole = CountMinSketch(width=1024, depth=4)
        whole.update_batch(h)
        assert np.array_equal(merged.table, whole.table)

    def test_weighted_updates_and_serde(self):
        s = CountMinSketch(width=512, depth=4)
        h = _rand_hashes(10, 16)
        s.update_batch(h, counts=np.full(10, 7, dtype=np.int64))
        assert (s.query_batch(h) >= 7).all()
        back = CountMinSketch.deserialize(s.serialize(), width=512, depth=4)
        assert np.array_equal(back.table, s.table)


# ---------------------------------------------------------------- quantiles
class TestQuantiles:
    @pytest.mark.parametrize("dist", ["uniform", "lognormal", "bimodal"])
    def test_tdigest_quantile_accuracy(self, dist):
        rng = np.random.default_rng(17)
        n = 100_000
        if dist == "uniform":
            x = rng.uniform(0, 1000, n)
        elif dist == "lognormal":
            x = rng.lognormal(3, 1, n)
        else:
            x = np.concatenate([rng.normal(10, 1, n // 2), rng.normal(1000, 5, n // 2)])
        td = TDigestSketch(delta=200)
        for chunk in np.array_split(x, 7):
            td.update_batch(chunk)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            est = td.quantile(q)
            true_rank = (x <= est).mean()
            assert abs(true_rank - q) < 0.02, (dist, q, true_rank)

    def test_tdigest_merge_accuracy(self):
        rng = np.random.default_rng(18)
        x = rng.exponential(100, 60_000)
        parts = np.array_split(x, 5)
        sks = []
        for p_ in parts:
            t = TDigestSketch(delta=200)
            t.update_batch(p_)
            sks.append(t)
        merged = functools.reduce(lambda a, b: a.merge(b), sks)
        for q in (0.1, 0.5, 0.9):
            true_rank = (x <= merged.quantile(q)).mean()
            assert abs(true_rank - q) < 0.025

    def test_tdigest_serde(self):
        t = TDigestSketch(delta=100)
        t.update_batch(np.arange(1000, dtype=float))
        back = TDigestSketch.deserialize(t.serialize())
        assert abs(back.quantile(0.5) - t.quantile(0.5)) < 1e-9

    def test_kll_rank_error(self):
        rng = np.random.default_rng(19)
        x = rng.normal(0, 1, 200_000)
        s = KLLSketch(k=200)
        for chunk in np.array_split(x, 9):
            s.update_batch(chunk)
        for q in (0.05, 0.25, 0.5, 0.75, 0.95):
            est = s.quantile(q)
            true_rank = (x <= est).mean()
            assert abs(true_rank - q) < 0.02, (q, true_rank)

    def test_kll_merge_rank_error(self):
        rng = np.random.default_rng(20)
        x = rng.uniform(-5, 5, 120_000)
        sks = []
        for p_ in np.array_split(x, 6):
            s = KLLSketch(k=200)
            s.update_batch(p_)
            sks.append(s)
        merged = functools.reduce(lambda a, b: a.merge(b), sks)
        assert merged.n == x.size
        for q in (0.1, 0.5, 0.9):
            true_rank = (x <= merged.quantile(q)).mean()
            assert abs(true_rank - q) < 0.025

    def test_kll_serde(self):
        s = KLLSketch(k=128)
        s.update_batch(np.arange(50_000, dtype=float))
        back = KLLSketch.deserialize(s.serialize())
        assert back.n == s.n
        assert abs(back.quantile(0.5) - s.quantile(0.5)) < 1e-9


class TestBlockedBloom:
    def test_fpr_within_bound(self):
        from biobloom_spark.sketch import blocked_size_bits

        n, p = 50_000, 0.0078125
        train, probe = _rand_hashes(n, 44), _rand_hashes(8 * n, 45)
        bf = BloomSketch.for_capacity(n, p, block_bits=512)
        assert bf.m_bits % 512 == 0
        assert bf.m_bits == blocked_size_bits(n, p, 7, 512)
        bf.update_batch(train)
        train_set = set(train.tolist())
        novel = np.asarray([x for x in probe.tolist() if x not in train_set], dtype=np.uint64)
        measured = bf.contains_batch(novel).mean()
        assert measured <= p, (measured, p)  # the north-rule bound

    def test_no_false_negatives_and_merge(self):
        h = _rand_hashes(20_000, 46)
        parts = _partitions(h, [7000, 14000])
        mk = lambda arr: (lambda b: (b.update_batch(arr), b)[1])(
            BloomSketch(m_bits=512 * 1024, num_hashes=7, block_bits=512)
        )
        a, b, c = (mk(p_) for p_ in parts)
        merged = a.merge(b).merge(c)
        whole = mk(h)
        assert np.array_equal(merged.bits, whole.bits)
        assert merged.contains_batch(h).all()

    def test_classic_and_blocked_incompatible(self):
        a = BloomSketch(m_bits=512 * 16, num_hashes=4, block_bits=512)
        b = BloomSketch(m_bits=512 * 16, num_hashes=4, block_bits=0)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            a.merge(b)

    def test_serde_roundtrip(self):
        bf = BloomSketch(m_bits=512 * 64, num_hashes=7, block_bits=512)
        bf.update_batch(_rand_hashes(1000, 47))
        back = BloomSketch.deserialize(bf.serialize(), bf.m_bits, bf.num_hashes, block_bits=512)
        assert np.array_equal(back.bits, bf.bits)
        assert back.contains_batch(_rand_hashes(1000, 47)).all()


class TestWordBlockedBloom:
    def test_fpr_within_bound(self):
        n, p = 100_000, 0.0078125
        train, probe = _rand_hashes(n, 54), _rand_hashes(8 * n, 55)
        bf = BloomSketch.for_capacity(n, p, block_bits=64)
        bf.update_batch(train)
        train_set = set(train.tolist())
        novel = np.asarray([x for x in probe.tolist() if x not in train_set], dtype=np.uint64)
        assert bf.contains_batch(novel).mean() <= p

    def test_no_false_negatives_merge_and_serde(self):
        h = _rand_hashes(30_000, 56)
        parts = _partitions(h, [9000, 21000])
        mk = lambda arr: (lambda b: (b.update_batch(arr), b)[1])(
            BloomSketch(m_bits=64 * 8192, num_hashes=7, block_bits=64)
        )
        a, b, c = (mk(p_) for p_ in parts)
        merged = a.merge(b).merge(c)
        whole = mk(h)
        assert np.array_equal(merged.bits, whole.bits)
        assert merged.contains_batch(h).all()
        back = BloomSketch.deserialize(merged.serialize(), merged.m_bits, 7, block_bits=64)
        assert back.contains_batch(h).all()

    def test_insert_and_check_semantics(self):
        h = _rand_hashes(1000, 57)
        bf = BloomSketch.for_capacity(5000, 0.0078125, block_bits=64)
        bf.update_batch(h)
        assert bf.update_batch(h) == 1000  # all redundant second time


class TestSegmentedWordBloom:
    """Segmented 64-bit layout (sketch.bloom.word_index64 + maker's
    distributed slice merge): parity between slice-built and
    locally-inserted bitmaps, and bound checks."""

    def _offsets(self, words_per_seg):
        return np.concatenate(([0], np.cumsum(words_per_seg))).astype(np.int64)

    def test_slice_build_equals_local_insert(self):
        from biobloom_spark.sketch.bloom import (
            or_scatter_sorted,
            probe_words64,
        )
        from biobloom_spark.sketch.hashing import km_probe, mulhigh64

        S, h = 8, 5
        words_per_seg = [300, 1, 77, 512, 64, 9, 130, 300]
        off = self._offsets(words_per_seg)
        m = int(off[-1]) * 64
        items = np.unique(_rand_hashes(50_000, 71))
        local = BloomSketch(m_bits=m, num_hashes=h, block_bits=64, seg_offsets=off)
        local.update_batch(items)
        # distributed path: split by top-3 hash bits, scatter each slice
        # independently (exactly what _seg_reduce_fn does), concatenate
        k = 3
        edges = np.arange(1, S, dtype=np.uint64) << np.uint64(64 - k)
        bounds = np.concatenate(([0], np.searchsorted(items, edges), [items.size]))
        slices = []
        for s in range(S):
            part = items[bounds[s]: bounds[s + 1]]
            w = np.zeros(words_per_seg[s], dtype=np.uint64)
            if part.size:
                h1, h2 = km_probe(part)
                lw = mulhigh64(h1 << np.uint64(k), np.uint64(w.size)).astype(np.int64)
                or_scatter_sorted(w, lw, probe_words64(h2, h))
            slices.append(w)
        dist_bits = np.concatenate(slices).view(np.uint8)
        assert np.array_equal(dist_bits, local.bits.view(np.uint8))
        assert local.contains_batch(items).all()

    def test_segment_ranges_respected_and_fpr(self):
        S = 16
        n, p = 60_000, 0.0078125
        sk = BloomSketch.for_capacity(n, p, block_bits=64)
        words = sk.m_bits // 64
        base, rem = divmod(words, S)
        off = self._offsets([base + (1 if s < rem else 0) for s in range(S)])
        seg = BloomSketch(m_bits=sk.m_bits, num_hashes=sk.num_hashes,
                          block_bits=64, seg_offsets=off)
        train = _rand_hashes(n, 72)
        seg.update_batch(train)
        assert seg.contains_batch(train).all()  # no false negatives
        probe = _rand_hashes(8 * n, 73)
        train_set = set(train.tolist())
        novel = np.asarray([x for x in probe.tolist() if x not in train_set],
                           dtype=np.uint64)
        assert seg.contains_batch(novel).mean() <= p

    def test_unsorted_insert_matches_sorted(self):
        off = self._offsets([100, 100, 200, 112])
        m = int(off[-1]) * 64
        items = _rand_hashes(5_000, 74)
        a = BloomSketch(m_bits=m, num_hashes=4, block_bits=64, seg_offsets=off)
        a.update_batch(items)  # np.unique → sorted fast path
        b = BloomSketch(m_bits=m, num_hashes=4, block_bits=64, seg_offsets=off)
        rng = np.random.default_rng(5)
        shuffled = items.copy()
        rng.shuffle(shuffled)
        b.update_batch(np.unique(shuffled), assume_unique=True)
        assert np.array_equal(a.bits, b.bits)

    def test_zero_width_segment_rejected_by_maker_split(self):
        from biobloom_spark.operators.maker import _pinned_seg_words

        ws = _pinned_seg_words({"m_bits": 64 * 5}, 16)  # fewer words than segs
        assert (ws >= 1).all() and len(ws) == 16
