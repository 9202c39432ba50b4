"""P-MinHash (reference pmh.h:80-140; Moulton & Jiang arXiv:1809.04052):
probability-Jaccard accuracy against the exact formula, reduction to classic
Jaccard under uniform weights, scale invariance, and the byte-identical
merge laws that make it Spark-distributable."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.pmh import PMinHash, exact_probability_jaccard


@pytest.fixture(scope="module")
def weighted_sets():
    rng = np.random.default_rng(7)
    fa = np.arange(100, dtype=np.uint64)
    fb = np.arange(50, 150, dtype=np.uint64)
    wa = rng.uniform(0.5, 5.0, 100)
    wb = rng.uniform(0.5, 5.0, 100)
    return fa, wa, fb, wb


def test_estimate_matches_exact_formula(weighted_sets):
    fa, wa, fb, wb = weighted_sets
    exact = exact_probability_jaccard(dict(zip(fa.tolist(), wa)), dict(zip(fb.tolist(), wb)))
    m = 4096
    a = PMinHash(m=m, seed=11).update(fa, counts=wa)
    b = PMinHash(m=m, seed=11).update(fb, counts=wb)
    sigma = np.sqrt(exact * (1 - exact) / m)
    assert abs(a.jaccard(b) - exact) <= 4 * sigma


def test_uniform_weights_reduce_to_classic_jaccard(weighted_sets):
    """J_P with equal weights == |A∩B| / |A∪B| (Moulton-Jiang §2)."""
    fa, _, fb, _ = weighted_sets
    m = 4096
    a = PMinHash(m=m, seed=3).update(fa)
    b = PMinHash(m=m, seed=3).update(fb)
    true = 50 / 150
    sigma = np.sqrt(true * (1 - true) / m)
    assert abs(a.jaccard(b) - true) <= 4 * sigma


def test_scale_invariance(weighted_sets):
    """J_P is scale-invariant per argument: scaling all weights must keep
    every sampled slot id identical (draws scale, argmins don't)."""
    fa, wa, *_ = weighted_sets
    a = PMinHash(m=512, seed=5).update(fa, counts=wa)
    b = PMinHash(m=512, seed=5).update(fa, counts=wa * 1000.0)
    assert (a.slot_ids == b.slot_ids).all()
    assert a.jaccard(b) == 1.0


def test_merge_partitioning_byte_identical(weighted_sets):
    """Any partitioning ∘ any merge order == single-pass bytes — the core
    Spark-correctness invariant (weights consistent per feature)."""
    fa, wa, fb, wb = weighted_sets
    feats = np.concatenate([fa, fb])
    wts = np.concatenate([wa, wb])
    one = PMinHash(m=256, seed=9).update(feats, counts=wts)
    rng = np.random.default_rng(1)
    for _ in range(5):
        cuts = np.sort(rng.integers(0, len(feats), 3))
        parts = [
            PMinHash(m=256, seed=9).update(feats[i:j], counts=wts[i:j])
            for i, j in zip(np.r_[0, cuts], np.r_[cuts, len(feats)])
        ]
        rng.shuffle(parts)
        assert merge_all(parts).to_bytes() == one.to_bytes()


def test_merge_is_max_weight_union():
    """Split weights max-combine (documented monoid): merging a feature seen
    with w=1 and w=10 equals a single pass at w=10, not w=11."""
    f = np.array([42], dtype=np.uint64)
    lo = PMinHash(m=128, seed=2).update(f, counts=np.array([1.0]))
    hi = PMinHash(m=128, seed=2).update(f, counts=np.array([10.0]))
    merged = lo.merge(from_bytes(hi.to_bytes()))
    assert merged.to_bytes() == hi.to_bytes()


def test_zero_weights_ignored_and_empty_ok():
    f = np.array([1, 2, 3], dtype=np.uint64)
    w = np.array([0.0, -1.0, 2.0])
    sk = PMinHash(m=64, seed=1).update(f, counts=w)
    only3 = PMinHash(m=64, seed=1).update(np.array([3], dtype=np.uint64), counts=np.array([2.0]))
    assert sk.to_bytes() == only3.to_bytes()
    empty = PMinHash(m=64, seed=1).update(np.array([], dtype=np.uint64))
    assert empty.n_filled() == 0
    assert empty.jaccard(only3) == 0.0


def test_param_mismatch_raises():
    a = PMinHash(m=64, seed=1)
    with pytest.raises(ValueError):
        a.merge(PMinHash(m=128, seed=1))
    with pytest.raises(ValueError):
        a.merge(PMinHash(m=64, seed=2))


def test_spark_weighted_build_matches_local(spark):
    """build_weighted_sketch over pair rows == local single pass (features
    unique per row, so the max-union monoid is exact here)."""
    from sketch_spark.spark.agg import build_weighted_sketch

    rng = np.random.default_rng(3)
    feats = np.arange(500, dtype=np.int64)
    wts = rng.uniform(0.1, 9.0, 500)
    rows = [(int(f), float(w)) for f, w in zip(feats, wts)]
    df = spark.createDataFrame(rows, "k long, w double").repartition(8)
    got = build_weighted_sketch(df, "pmh", "k", "w", {"m": 256, "seed": 17})
    want = PMinHash(m=256, seed=17).update(feats, counts=wts)
    assert got.to_bytes() == want.to_bytes()
