"""Scoring-kernel unit tests — SeqEval semantics ports.

Includes the reference's scoring micro-test shape
(/root/reference/Tests/SeqEvalTests.cpp:7-42: a sequence with an invalid
gap, min-match-len N passes and N+1 fails) re-expressed over token frames.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from biobloom_spark.config import ScoringConfig
from biobloom_spark.functions.stats import betainc, binom_sf, min_count, score_to_fpr
from biobloom_spark.operators.scoring import (
    SegmentedBatch,
    score_batch,
    score_with_skip_reference,
)


def _batch_from_bools(hit_lists):
    """Build a SegmentedBatch whose frame counts match the given per-doc hit
    vectors, plus the flat hit array (hashes are dummies — tests drive the
    kernel directly)."""
    arrays = [np.arange(len(h), dtype=np.uint64) for h in hit_lists]
    batch = SegmentedBatch.from_hash_arrays(arrays)
    flat = np.concatenate([np.asarray(h, dtype=bool) for h in hit_lists]) if hit_lists else np.zeros(0, bool)
    return batch, flat


class TestSimple:
    def test_streak_weighting(self):
        # one run of 3 + one run of 1 → 0.5+1+1 + 0.5 = 3.0 over 6 frames
        batch, hit = _batch_from_bools([[1, 1, 1, 0, 1, 0]])
        s, m = score_batch(hit, batch, ScoringConfig(method="simple", threshold=0.15), 0.01, 3)
        assert s[0] == pytest.approx(3.0 / 6)
        assert m[0]

    def test_zero_frames_is_nomatch(self):
        # read shorter than k → no frames → no match (SeqEval.h:221-223)
        batch, hit = _batch_from_bools([[]])
        s, m = score_batch(hit, batch, ScoringConfig(method="simple"), 0.01, 3)
        assert s[0] == 0.0 and not m[0]

    def test_multi_doc_segmentation_no_run_bleed(self):
        # trailing run of doc0 must not join leading run of doc1
        batch, hit = _batch_from_bools([[0, 1, 1], [1, 1, 0]])
        s, _ = score_batch(hit, batch, ScoringConfig(method="simple", threshold=0.9), 0.01, 3)
        assert s[0] == pytest.approx(1.5 / 3)
        assert s[1] == pytest.approx(1.5 / 3)

    def test_threshold_boundary(self):
        batch, hit = _batch_from_bools([[1, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
        cfg = ScoringConfig(method="simple", threshold=0.05)
        s, m = score_batch(hit, batch, cfg, 0.01, 3)
        assert s[0] == pytest.approx(0.05)
        assert m[0]  # >= is a hit


class TestHarmonic:
    def test_run_contribution_is_l_minus_harmonic(self):
        # run of 3 → 3 - (1 + 1/2 + 1/3); run of 1 → 0
        batch, hit = _batch_from_bools([[1, 1, 1, 0, 1]])
        s, _ = score_batch(hit, batch, ScoringConfig(method="harmonic", threshold=0.1), 0.01, 3)
        expect = (3 - (1 + 0.5 + 1 / 3)) / 5
        assert s[0] == pytest.approx(expect)

    def test_short_runs_penalized_vs_simple(self):
        scattered = [[1, 0, 1, 0, 1, 0]]
        solid = [[1, 1, 1, 0, 0, 0]]
        for mth in ("harmonic",):
            b1, h1 = _batch_from_bools(scattered)
            b2, h2 = _batch_from_bools(solid)
            s1, _ = score_batch(h1, b1, ScoringConfig(method=mth), 0.01, 3)
            s2, _ = score_batch(h2, b2, ScoringConfig(method=mth), 0.01, 3)
            assert s2[0] > s1[0]


class TestMinMatchLen:
    def test_run_covers_tokens(self):
        # run of L shingle-hits covers L + w - 1 tokens; w=3
        batch, hit = _batch_from_bools([[1, 1, 1, 0, 0]])  # covers 5 tokens
        cfg5 = ScoringConfig(method="minmatchlen", min_match_len=5)
        cfg6 = ScoringConfig(method="minmatchlen", min_match_len=6)
        _, m5 = score_batch(hit, batch, cfg5, 0.01, 3)
        _, m6 = score_batch(hit, batch, cfg6, 0.01, 3)
        assert m5[0] and not m6[0]  # SeqEvalTests.cpp:24-40 analog

    def test_gap_resets_run(self):
        # two runs of 2 never cover 5 tokens even though total hits = 4
        batch, hit = _batch_from_bools([[1, 1, 0, 1, 1]])
        cfg = ScoringConfig(method="minmatchlen", min_match_len=5)
        _, m = score_batch(hit, batch, cfg, 0.01, 3)
        assert not m[0]


class TestBinomial:
    def test_betainc_against_known_values(self):
        # I_0.5(2, 2) = 0.5; I_x(1, b) = 1-(1-x)^b
        assert betainc(2, 2, 0.5) == pytest.approx(0.5, rel=1e-10)
        assert betainc(1, 5, 0.2) == pytest.approx(1 - 0.8**5, rel=1e-10)

    def test_binom_sf_exact_small(self):
        # n=10, p=0.3, P(X>=4) via direct sum
        n, p = 10, 0.3
        direct = sum(
            math.comb(n, k) * p**k * (1 - p) ** (n - k) for k in range(4, n + 1)
        )
        assert binom_sf(4, n, p) == pytest.approx(direct, rel=1e-9)

    def test_min_count_monotone_and_correct(self):
        c = min_count(1000, 0.008, 1e-10)
        assert binom_sf(c, 1000, 0.008) < 1e-10
        assert binom_sf(c - 1, 1000, 0.008) >= 1e-10
        assert min_count(1000, 0.008, 1e-4) <= c

    def test_score_to_fpr(self):
        # -s 100 → 1e-10 (BioBloomCategorizer.cpp:419-421)
        assert score_to_fpr(100) == pytest.approx(1e-10)

    def test_binomial_matching(self):
        frames = 200
        cfg = ScoringConfig(method="binomial", min_fpr=1e-10)
        thresh = min_count(frames, 0.008, 1e-10)
        hit = np.zeros(frames, dtype=bool)
        hit[:thresh] = True
        batch, _ = _batch_from_bools([hit.tolist()])
        _, m = score_batch(hit, batch, cfg, 0.008, 3)
        assert m[0]
        hit2 = np.zeros(frames, dtype=bool)
        hit2[: thresh - 1] = True
        _, m2 = score_batch(hit2, batch, cfg, 0.008, 3)
        assert not m2[0]


class TestSkipReferenceMode:
    def test_skip_reduces_score_after_streak_miss(self):
        hit = np.array([1, 1, 1, 0, 1, 1, 1, 1, 1, 1], dtype=bool)
        cfg = ScoringConfig(method="simple", streak_threshold=3)
        skip_score = score_with_skip_reference(hit, hit.size, cfg)
        batch, flat = _batch_from_bools([hit.tolist()])
        full_score, _ = score_batch(flat, batch, cfg, 0.01, 3)
        assert skip_score <= full_score[0]

    def test_no_streak_no_skip_identical(self):
        hit = np.array([1, 0, 1, 0, 1, 0], dtype=bool)
        cfg = ScoringConfig(method="simple", streak_threshold=3)
        batch, flat = _batch_from_bools([hit.tolist()])
        full, _ = score_batch(flat, batch, cfg, 0.01, 3)
        assert score_with_skip_reference(hit, hit.size, cfg) == pytest.approx(full[0])


def _eval_simple_reference_literal(hit, threshold, streak_threshold, k, anti_exit=True):
    """Literal decision-level transcription of evalSimple
    (/root/reference/Common/SeqEval.h:37-114) over a precomputed hit
    vector (clean read: itr.pos() always advances by 1 except skips):
    denormalized thresholds, anti-score early exit, and the
    skip-k-frames-after-streak-miss heuristic at SeqEval.h:94-110.
    ``anti_exit=False`` disables the anti-score rejection (floor() makes it
    strictly more aggressive than the exhaustive threshold — a real
    sensitivity reduction, separate from the skip heuristic)."""
    frames = len(hit)
    if frames == 0:
        return False
    thres = threshold * frames  # denormalizeScore(threshold, k, len)
    anti_thres = math.floor((1.0 - threshold) * frames) if anti_exit else frames + 1
    score, anti, streak = 0.0, 0, 0
    if hit[0]:
        score += 0.5
        if thres <= score:
            return True
        streak += 1
    else:
        anti += 1
        if anti_thres <= anti:
            return False
    i = 1
    while i < frames:
        if hit[i]:
            score += 0.5 if streak == 0 else 1.0
            if thres <= score:
                return True
            i += 1
            streak += 1
        else:
            if streak < streak_threshold:
                anti += 1
                if anti_thres <= anti:
                    return False
                i += 1
            else:
                skip_end = i + k  # skipEnd = itr.pos() + kmerSize
                while i < skip_end:
                    anti += 1
                    if anti_thres <= anti:
                        return False
                    i += 1
            streak = 0
    return False


class TestSkipReferenceDifferential:
    def test_decision_parity_vs_literal_transcription(self):
        """score_with_skip_reference must make the identical match decision
        as the literal SeqEval.h transcription on random hit vectors (the
        anti-score early exit is a pure optimization: when it fires, the
        final score provably can't reach the threshold)."""
        rng = np.random.default_rng(7)
        cfg = ScoringConfig(method="simple", streak_threshold=3)
        w = 3
        for trial in range(500):
            frames = int(rng.integers(1, 40))
            density = rng.uniform(0.1, 0.9)
            hit = rng.random(frames) < density
            theta = float(rng.choice([0.15, 0.35, 0.55, 0.75]))
            got_score = score_with_skip_reference(hit, frames, cfg, shingle_w=w)
            # compare in denormalized space, same arithmetic as the reference
            got = theta * frames <= got_score * frames + 1e-9
            # skip-heuristic parity: identical decision with anti-exit off
            ref = _eval_simple_reference_literal(
                hit, theta, cfg.streak_threshold, w, anti_exit=False
            )
            assert got == ref, (trial, hit.tolist(), theta)
            # the anti-score exit only ever flips match -> noMatch (it is a
            # rejection heuristic): whenever the full reference says True,
            # the skip scorer must agree
            ref_full = _eval_simple_reference_literal(
                hit, theta, cfg.streak_threshold, w, anti_exit=True
            )
            assert (not ref_full) or got, (trial, hit.tolist(), theta)

    def test_skip_jump_is_shingle_window(self):
        """After a miss on a streak >= streak_threshold the scorer must jump
        exactly w frames (SeqEval.h:103 jumps kmerSize): a hit placed w-1
        after the miss is skipped; a hit at w after the miss is seen."""
        cfg = ScoringConfig(method="simple", streak_threshold=3)
        w = 4
        base = [1, 1, 1, 0]  # streak of 3 then a miss at i=3 -> skip to i=7
        skipped = np.array(base + [0, 0, 0, 1, 0, 0], dtype=bool)  # hit at 7
        seen = score_with_skip_reference(skipped, skipped.size, cfg, shingle_w=w)
        assert seen * skipped.size == pytest.approx(0.5 + 1 + 1 + 0.5)  # hit at 7 seen
        inside = np.array(base + [0, 1, 0, 0, 0, 0], dtype=bool)  # hit at 5 (inside skip)
        missed = score_with_skip_reference(inside, inside.size, cfg, shingle_w=w)
        assert missed * inside.size == pytest.approx(0.5 + 1 + 1)  # hit at 5 skipped
