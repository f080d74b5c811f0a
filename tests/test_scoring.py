"""Scorer parity tests.

``seq_eval_reference`` below is an independent, sequential, per-row
re-statement of the SeqEval.h state machines (evalSimple :37-114,
evalHarmonic :116-193, evalBinomial :218-290, evalMinMatchLen :295-332,
plus the exhaustive *Score variants :334-491), used as the test oracle
for the vectorized lockstep implementation in biobloom_ray.scoring.
Property tests drive both with random hit bitmaps (hypothesis + seeded
numpy) so every branch — streak bonus, anti-score reject, jump skip —
is exercised.  FIXTURES.md F4 boundary cases included.
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from biobloom_ray.scoring import (
    STREAK_THRESHOLD,
    binom_sf,
    calc_min_count,
    eval_batch,
    score_batch,
)


# ---------------------------------------------------------------------------
# sequential oracle (direct restatement of the C++ loops)
# ---------------------------------------------------------------------------

def seq_eval(hits, k, method, threshold, bf_fpr=None, subtract=None,
             streak_threshold=STREAK_THRESHOLD):
    F = len(hits)
    if F == 0:
        return False
    if method == "length":
        return seq_eval_score(hits, k, "length", subtract=subtract) >= round(threshold)
    if method in ("simple", "harmonic"):
        thres = threshold * F
        anti_thres = math.floor((1.0 - threshold) * F)
    else:  # binomial
        thres = calc_min_count(F, bf_fpr, threshold)
        anti_thres = F - thres if thres <= F else math.inf
    score = 0.0
    anti = 0
    streak = 0
    pos = 0
    while pos < F:
        if hits[pos]:
            counted = subtract is None or not subtract[pos]
            if counted:
                if method == "simple":
                    score += 0.5 if streak == 0 else 1.0
                elif method == "harmonic":
                    score += 0.5 if streak == 0 else 1.0 - 1.0 / (1.0 + streak)
                else:
                    score += 1
            if thres <= score:
                return True
            streak += 1
            pos += 1
        else:
            if streak < streak_threshold:
                anti += 1
                if anti_thres <= anti:
                    return False
                pos += 1
            else:
                skip_end = pos + k
                while pos < min(skip_end, F):
                    anti += 1
                    if anti_thres <= anti:
                        return False
                    pos += 1
            streak = 0
    return False


def seq_eval_score(hits, k, method, bf_fpr=None, subtract=None,
                   streak_threshold=STREAK_THRESHOLD):
    F = len(hits)
    if F == 0:
        return 0.0
    if method == "length":
        match_len = 0
        best = 0
        for pos in range(F):
            if hits[pos]:
                if subtract is None or not subtract[pos]:
                    match_len = k if match_len == 0 else match_len + 1
            else:
                match_len = 0
            best = max(best, match_len)
        return float(best)
    score = 0.0
    streak = 0
    pos = 0
    while pos < F:
        if hits[pos]:
            counted = subtract is None or not subtract[pos]
            if counted:
                if method == "simple":
                    score += 0.5 if streak == 0 else 1.0
                elif method == "harmonic":
                    score += 0.5 if streak == 0 else 1.0 - 1.0 / (1.0 + streak)
                else:
                    score += 1
            streak += 1
            pos += 1
        else:
            if streak < streak_threshold:
                pos += 1
            else:
                pos = min(pos + k, F)
            streak = 0
    if method in ("simple", "harmonic"):
        return score / F
    p = binom_sf(F, bf_fpr, int(score))
    return -10.0 * math.log10(p) if p > 0 else math.inf


def _flat(rows):
    hits = np.concatenate([np.array(r, dtype=bool) for r in rows]) if rows else np.empty(0, bool)
    nf = np.array([len(r) for r in rows], dtype=np.int64)
    return hits, nf


# ---------------------------------------------------------------------------
# property tests: vectorized == sequential
# ---------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.lists(st.booleans(), min_size=0, max_size=60), min_size=1, max_size=12),
    st.sampled_from(["simple", "harmonic"]),
    st.floats(min_value=0.05, max_value=0.9),
    st.integers(min_value=2, max_value=8),
)
def test_simple_harmonic_parity(rows, method, threshold, k):
    hits, nf = _flat(rows)
    got = eval_batch(hits, nf, k, method=method, threshold=threshold)
    want = [seq_eval(r, k, method, threshold) for r in rows]
    assert got.tolist() == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.lists(st.booleans(), min_size=0, max_size=60), min_size=1, max_size=10),
    st.floats(min_value=1e-6, max_value=0.2),
    st.integers(min_value=2, max_value=6),
)
def test_binomial_parity(rows, min_fpr, k):
    bf_fpr = 0.05
    hits, nf = _flat(rows)
    got = eval_batch(hits, nf, k, method="binomial", threshold=min_fpr, bf_fpr=bf_fpr)
    want = [seq_eval(r, k, "binomial", min_fpr, bf_fpr=bf_fpr) for r in rows]
    assert got.tolist() == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.lists(st.booleans(), min_size=0, max_size=60), min_size=1, max_size=10),
    st.integers(min_value=3, max_value=20),
    st.integers(min_value=2, max_value=6),
)
def test_minmatchlen_parity(rows, min_len, k):
    hits, nf = _flat(rows)
    got = eval_batch(hits, nf, k, method="length", threshold=float(min_len))
    want = [seq_eval(r, k, "length", float(min_len)) for r in rows]
    assert got.tolist() == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.lists(st.booleans(), min_size=0, max_size=50), min_size=1, max_size=10),
    st.sampled_from(["simple", "harmonic", "length"]),
    st.integers(min_value=2, max_value=6),
)
def test_score_parity(rows, method, k):
    hits, nf = _flat(rows)
    got = score_batch(hits, nf, k, method=method)
    want = [seq_eval_score(r, k, method) for r in rows]
    assert got.tolist() == pytest.approx(want)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.lists(st.booleans(), min_size=1, max_size=40), min_size=1, max_size=8),
    st.integers(min_value=2, max_value=5),
)
def test_binomial_score_parity(rows, k):
    bf_fpr = 0.03
    hits, nf = _flat(rows)
    got = score_batch(hits, nf, k, method="binomial", bf_fpr=bf_fpr)
    want = [seq_eval_score(r, k, "binomial", bf_fpr=bf_fpr) for r in rows]
    for g, w in zip(got, want):
        if math.isinf(w):
            assert math.isinf(g)
        else:
            assert g == pytest.approx(w)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.lists(st.tuples(st.booleans(), st.booleans()), min_size=0, max_size=40),
             min_size=1, max_size=8),
    st.sampled_from(["simple", "harmonic", "binomial", "length"]),
)
def test_subtract_filter_parity(rows, method):
    k = 4
    threshold = {"simple": 0.3, "harmonic": 0.3, "binomial": 0.01, "length": 6.0}[method]
    hit_rows = [[h for h, _ in r] for r in rows]
    sub_rows = [[s and h for h, s in r] for r in rows]  # subtract only matters on hits
    hits, nf = _flat(hit_rows)
    subs, _ = _flat(sub_rows)
    got = eval_batch(hits, nf, k, method=method, threshold=threshold,
                     bf_fpr=0.05, subtract_hits=subs)
    want = [seq_eval(h, k, method, threshold, bf_fpr=0.05, subtract=s)
            for h, s in zip(hit_rows, sub_rows)]
    assert got.tolist() == want


# ---------------------------------------------------------------------------
# FIXTURES.md F4 boundary cases
# ---------------------------------------------------------------------------

def test_minmatchlen_boundary_translated():
    # Tests/SeqEvalTests.cpp:9-41 translated: k=4, the first 5 frames hit.
    # A run of r consecutive hit frames covers k + r - 1 = 4 + 5 - 1 = 8...
    # the reference's fixture: query shares a 5-char suffix/prefix overlap
    # giving a run of 2 frames → length 5: match at min_match_len=5, not 6.
    hits = np.array([True, True, False, False, False, False, False], dtype=bool)
    nf = np.array([7])
    assert eval_batch(hits, nf, 4, method="length", threshold=5.0)[0]
    assert not eval_batch(hits, nf, 4, method="length", threshold=6.0)[0]


def test_first_hit_half_credit():
    # single hit frame scores 0.5; threshold 0.5/F accepts, anything above rejects
    hits = np.array([True, False, False, False], dtype=bool)
    nf = np.array([4])
    assert eval_batch(hits, nf, 3, method="simple", threshold=0.5 / 4)[0]
    assert not eval_batch(hits, nf, 3, method="simple", threshold=0.6 / 4)[0]


def test_streak_skip_changes_outcome():
    # 4 hits → miss (streak 4 ≥ 3) → jump skips k frames that are all hits;
    # exhaustive scorer would have counted them — heuristic is part of the
    # spec (README.md:185), so hits after the jump window don't score.
    k = 5
    row = [True] * 4 + [False] + [True] * 5  # jump skips frames 4..8
    hits, nf = _flat([row])
    s = score_batch(hits, nf, k, method="simple")[0]
    # 0.5 + 3·1.0 before the miss; frames 5..8 hit but are inside the skip
    # window so score nothing; frame 9 restarts a streak for 0.5.
    assert s == pytest.approx(4.0 / 10)
    # without the jump the same bitmap would score 0.5+3 + 0.5+4 = 8
    no_jump = score_batch(hits, nf, k, method="simple", streak_threshold=10**9)[0]
    assert no_jump == pytest.approx(8.0 / 10)


def test_empty_and_short_rows_never_match():
    hits, nf = _flat([[], [True], []])
    got = eval_batch(hits, nf, 4, method="simple", threshold=0.4)
    assert got.tolist() == [False, True, False]


def test_calc_min_count_monotone():
    assert calc_min_count(0, 0.01, 0.05) == 1
    a = calc_min_count(100, 0.01, 0.05)
    b = calc_min_count(100, 0.01, 1e-6)
    assert b >= a >= 1
    # tighter FPR bound needs more matches
    c = calc_min_count(100, 0.2, 1e-6)
    assert c > b


def test_binom_sf_basic():
    assert binom_sf(10, 0.5, 10) == 0.0
    assert binom_sf(10, 0.5, -1) == 1.0
    # P(X > 4) for Bin(10, .5) = 1 - CDF(4) = 0.623046875
    assert binom_sf(10, 0.5, 4) == pytest.approx(0.623046875)


def test_custom_scorer_registry():
    # §2.10 extension surface: a fraction-of-hits scorer plugs in
    from biobloom_ray.scoring import _CUSTOM_SCORERS, eval_batch, register_scorer

    def frac_eval(hits, n_frames, k, threshold=0.5, **kw):
        import numpy as np
        out = np.zeros(len(n_frames), dtype=bool)
        off = 0
        for i, F in enumerate(n_frames):
            if F:
                out[i] = hits[off:off + F].mean() >= threshold
            off += F
        return out

    register_scorer("fraction", frac_eval)
    try:
        hits, nf = _flat([[True, True, False, False], [True] * 4])
        got = eval_batch(hits, nf, 3, method="fraction", threshold=0.6)
        assert got.tolist() == [False, True]
        with pytest.raises(ValueError):
            register_scorer("simple", frac_eval)
    finally:
        _CUSTOM_SCORERS.pop("fraction", None)
