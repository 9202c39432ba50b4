"""SampledMultiplicity (ntcard capability) + MisraGries (top-k capability):
exactness at r=0 / under capacity, sampling accuracy, the Mergeable
Summaries error guarantee under arbitrary merge trees."""

from collections import Counter

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.mult import SampledMultiplicity
from sketch_spark.sketches.topk import MisraGries

RNG = np.random.default_rng(31)
ZIPF = (np.minimum(RNG.zipf(1.3, 200_000), 50_000) - 1).astype(np.int64)


def _true_hist(data, max_mult=64):
    _, counts = np.unique(data, return_counts=True)
    h = np.zeros(max_mult + 1)
    clipped = np.where(counts <= max_mult, counts, 0)
    h += np.bincount(clipped, minlength=max_mult + 1)
    return h


# ---------------- multiplicity -------------------------------------------------


def test_mult_exact_at_r0():
    """r=0 → no sampling → the histogram is exact."""
    sk = SampledMultiplicity(r=0).update(ZIPF)
    np.testing.assert_array_equal(sk.histogram(64), _true_hist(ZIPF))
    assert sk.distinct_estimate() == len(np.unique(ZIPF))
    assert sk.total_estimate() == len(ZIPF)


def test_mult_sampled_estimates():
    sk = SampledMultiplicity(r=6).update(ZIPF)
    true_distinct = len(np.unique(ZIPF))
    # binomial sampling at 2^-6 over ~38k distinct → ~600 samples, σ/µ ≈ 4%
    assert abs(sk.distinct_estimate() - true_distinct) / true_distinct < 0.15
    h, th = sk.histogram(8), _true_hist(ZIPF, 8)
    # f1 is the biggest bin; sampled estimate within 15%
    assert abs(h[1] - th[1]) / th[1] < 0.15


def test_mult_merge_equals_single_pass_byte_identical():
    single = SampledMultiplicity(r=4).update(ZIPF)
    merged = merge_all(SampledMultiplicity(r=4).update(p) for p in np.array_split(ZIPF, 9))
    assert merged.to_bytes() == single.to_bytes()


def test_mult_merge_sums_counts():
    a = SampledMultiplicity(r=0).update(np.array([1, 1, 2], dtype=np.int64))
    b = SampledMultiplicity(r=0).update(np.array([1, 3], dtype=np.int64))
    a.merge(b)
    h = a.histogram(4)
    # value 1 → count 3, value 2 → 1, value 3 → 1  ⇒ f1=2, f3=1
    assert h[1] == 2 and h[3] == 1


def test_mult_serialization_round_trip():
    sk = SampledMultiplicity(r=4).update(ZIPF[:10_000])
    assert from_bytes(sk.to_bytes()).to_bytes() == sk.to_bytes()


def test_mult_merge_mismatch_raises():
    with pytest.raises(ValueError):
        SampledMultiplicity(r=4).merge(SampledMultiplicity(r=5))


# ---------------- Misra-Gries top-k ----------------------------------------------


def test_mg_exact_under_capacity():
    data = RNG.integers(0, 500, 50_000, dtype=np.int64)
    sk = MisraGries(m=1000).update(data)
    truth = Counter(data.tolist())
    for key, est in sk.topk(10):
        assert est == truth[key]
    assert sk.error_bound() == 0


def test_mg_guarantee_over_capacity():
    """est ≤ true ≤ est + decremented, and the undercount ≤ N/(m+1)."""
    sk = MisraGries(m=256).update(ZIPF)
    truth = Counter(ZIPF.tolist())
    n = len(ZIPF)
    assert sk.error_bound() <= n // (256 + 1) + 1
    keys = np.array([k for k, _ in truth.most_common(20)], dtype=np.int64)
    ests = sk.query(keys)
    for key, est in zip(keys, ests):
        assert est <= truth[int(key)] <= est + sk.error_bound()


def test_mg_topk_recovers_heavy_hitters():
    """Every item with freq > N/(m+1) must be present (MG guarantee)."""
    sk = MisraGries(m=512).update(ZIPF)
    n = len(ZIPF)
    thresh = n / (512 + 1)
    truth = Counter(ZIPF.tolist())
    heavy = {k for k, c in truth.items() if c > thresh}
    tracked = {k for k, _ in sk.topk(len(sk.keys))}
    assert heavy <= tracked


def test_mg_merge_keeps_guarantee():
    """Mergeable-summaries theorem: after arbitrary partition/merge the
    combined undercount stays ≤ N/(m+1) (sum of decrements tracked)."""
    parts = np.array_split(ZIPF, 7)
    merged = merge_all(MisraGries(m=256).update(p) for p in parts)
    truth = Counter(ZIPF.tolist())
    n = len(ZIPF)
    assert merged.error_bound() <= n // (256 + 1) + 7  # slack: per-part rounding
    keys = np.array([k for k, _ in truth.most_common(10)], dtype=np.int64)
    ests = merged.query(keys)
    for key, est in zip(keys, ests):
        assert est <= truth[int(key)] <= est + merged.error_bound()


def test_mg_weighted_update():
    sk = MisraGries(m=16)
    sk.update(np.array([5, 7], dtype=np.int64), counts=np.array([100, 3]))
    assert dict(sk.topk(2))[5] == 100


def test_mg_deterministic_topk_order():
    sk = MisraGries(m=64).update(np.array([3, 3, 1, 1, 2], dtype=np.int64))
    assert sk.topk(3) == [(1, 2), (3, 2), (2, 1)]  # count desc, key asc


def test_mg_serialization_round_trip():
    sk = MisraGries(m=128).update(ZIPF[:20_000])
    back = from_bytes(sk.to_bytes())
    assert back.to_bytes() == sk.to_bytes()
    assert back.error_bound() == sk.error_bound()


def test_mg_weighted_update_fractional_and_large():
    """Regression (round-2 advice): fractional weights round to nearest, not
    truncate toward zero; integer weights accumulate exactly in int64
    (no float64 round-trip above 2^53)."""
    sk = MisraGries(m=16)
    sk.update(np.full(10, 5, dtype=np.int64), counts=np.full(10, 0.9))
    assert dict(sk.topk(1))[5] == 9  # 10 × 0.9 → 9, not 0
    big = MisraGries(m=16)
    w = np.array([2**60, 2**60 + 1], dtype=np.int64)
    big.update(np.array([1, 1], dtype=np.int64), counts=w)
    assert dict(big.topk(1))[1] == 2**61 + 1  # exact int accumulation
