"""ICWS (reference bbmh.h:775-832; Ioffe ICDM 2010): weighted-Jaccard
(Σmin/Σmax) accuracy against the exact formula, reduction to classic
Jaccard at uniform weights, and the feature-consistent merge contract."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.icws import ICWS, exact_weighted_jaccard


@pytest.fixture(scope="module")
def weighted_sets():
    rng = np.random.default_rng(11)
    fa = np.arange(100, dtype=np.uint64)
    fb = np.arange(50, 150, dtype=np.uint64)
    return fa, rng.uniform(0.5, 5.0, 100), fb, rng.uniform(0.5, 5.0, 100)


def test_estimate_matches_exact_weighted_jaccard(weighted_sets):
    fa, wa, fb, wb = weighted_sets
    exact = exact_weighted_jaccard(dict(zip(fa.tolist(), wa)), dict(zip(fb.tolist(), wb)))
    m = 4096
    a = ICWS(m=m, seed=5).update(fa, counts=wa)
    b = ICWS(m=m, seed=5).update(fb, counts=wb)
    sigma = np.sqrt(exact * (1 - exact) / m)
    assert abs(a.jaccard(b) - exact) <= 4 * sigma


def test_uniform_weights_reduce_to_classic_jaccard(weighted_sets):
    fa, _, fb, _ = weighted_sets
    m = 4096
    a = ICWS(m=m, seed=3).update(fa)
    b = ICWS(m=m, seed=3).update(fb)
    true = 1 / 3
    assert abs(a.jaccard(b) - true) <= 4 * np.sqrt(true * (1 - true) / m)


def test_merge_feature_disjoint_byte_identical(weighted_sets):
    """The documented contract: weights consistent per feature ⇒ any
    partitioning ∘ any merge order == single-pass bytes."""
    fa, wa, *_ = weighted_sets
    one = ICWS(m=256, seed=9).update(fa, counts=wa)
    rng = np.random.default_rng(1)
    for _ in range(5):
        cuts = np.sort(rng.integers(0, len(fa), 3))
        parts = [
            ICWS(m=256, seed=9).update(fa[i:j], counts=wa[i:j])
            for i, j in zip(np.r_[0, cuts], np.r_[cuts, len(fa)])
        ]
        rng.shuffle(parts)
        assert merge_all(parts).to_bytes() == one.to_bytes()
    assert from_bytes(one.to_bytes()).to_bytes() == one.to_bytes()


def test_zero_weights_skipped_and_mismatch_raises():
    f = np.array([1, 2], dtype=np.uint64)
    sk = ICWS(m=64, seed=1).update(f, counts=np.array([0.0, 2.0]))
    only2 = ICWS(m=64, seed=1).update(np.array([2], dtype=np.uint64), counts=np.array([2.0]))
    assert sk.to_bytes() == only2.to_bytes()
    with pytest.raises(ValueError):
        sk.merge(ICWS(m=128, seed=1))
