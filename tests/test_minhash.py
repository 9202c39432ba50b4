"""Bottom-k MinHash (KMV): cardinality + Jaccard accuracy, the reference's
merge-associativity identity, exact degeneration below fill, counting
variant's exact multiset algebra.

Reference analogs: testsrc/mhtest.cpp:40-68 (|JI−true|/true < 0.1 at
k=1024), testsrc/testmhmerge.cpp:28-40 (f1.union_size(f2) equals
(s1+s2).finalize().cardinality_estimate()), testsrc/cmtest.cpp:26-33 (exact
set-algebra equality vs std::set_intersection/union)."""

from collections import Counter

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.minhash import BottomKMinHash, CountingBottomKMinHash

RNG = np.random.default_rng(99)


def test_exact_below_fill():
    vals = np.arange(100, dtype=np.int64)
    mh = BottomKMinHash(k=1024).update(vals)
    assert mh.cardinality_estimate() == 100.0
    other = BottomKMinHash(k=1024).update(np.arange(50, 150, dtype=np.int64))
    # both under-filled → exact Jaccard of the underlying sets: 50/150
    assert mh.jaccard_index(other) == pytest.approx(50 / 150)


def test_cardinality_estimate_large_set():
    n = 1_000_000
    mh = BottomKMinHash(k=1024).update(np.arange(n, dtype=np.int64))
    # KMV σ ≈ 1/√k ≈ 3.1%; mhtest asserts 10% relative
    assert abs(mh.cardinality_estimate() - n) / n < 0.1


def test_jaccard_accuracy_known_overlap():
    """mhtest.cpp:40-68 geometry: true JI = 1/3 (A=[0,2M), B=[1M,3M))."""
    a = BottomKMinHash(k=1024).update(np.arange(0, 2_000_000, dtype=np.int64))
    b = BottomKMinHash(k=1024).update(np.arange(1_000_000, 3_000_000, dtype=np.int64))
    true_ji = 1.0 / 3.0
    assert abs(a.jaccard_index(b) - true_ji) / true_ji < 0.1


def test_union_size_equals_merged_cardinality():
    """The testmhmerge.cpp:30 identity, exactly."""
    a = BottomKMinHash(k=512).update(RNG.integers(0, 2**40, 100_000, dtype=np.int64))
    b = BottomKMinHash(k=512).update(RNG.integers(0, 2**40, 100_000, dtype=np.int64))
    assert a.union_size(b) == a.copy().merge(b).cardinality_estimate()


def test_merge_equals_single_pass_byte_identical():
    data = RNG.integers(0, 2**40, 300_000, dtype=np.int64)
    single = BottomKMinHash(k=1024).update(data)
    merged = merge_all(BottomKMinHash(k=1024).update(p) for p in np.array_split(data, 11))
    assert merged.to_bytes() == single.to_bytes()


def test_merge_associative_commutative():
    chunks = [RNG.integers(0, 2**40, 50_000, dtype=np.int64) for _ in range(3)]
    a, b, c = (BottomKMinHash(k=256).update(ch) for ch in chunks)
    assert a.copy().merge(b).merge(c).to_bytes() == a.copy().merge(b.copy().merge(c)).to_bytes()
    assert a.copy().merge(b).to_bytes() == b.copy().merge(a).to_bytes()


def test_threshold_prune_does_not_change_state():
    """The bottom-k prune (cand < kth min) is a pure optimization: state must
    equal the unpruned reference fold."""
    data = RNG.integers(0, 2**40, 50_000, dtype=np.int64)
    inc = BottomKMinHash(k=128)
    for piece in np.array_split(data, 100):  # many updates → prune path hot
        inc.update(piece)
    one = BottomKMinHash(k=128).update(data)
    assert inc.to_bytes() == one.to_bytes()


def test_intersection_containment():
    a = BottomKMinHash(k=2048).update(np.arange(0, 200_000, dtype=np.int64))
    b = BottomKMinHash(k=2048).update(np.arange(100_000, 300_000, dtype=np.int64))
    assert abs(a.intersection_size(b) - 100_000) / 100_000 < 0.15
    assert abs(a.containment_index(b) - 0.5) < 0.07


def test_serialization_round_trip():
    mh = BottomKMinHash(k=256).update(RNG.integers(0, 2**40, 10_000, dtype=np.int64))
    assert from_bytes(mh.to_bytes()).to_bytes() == mh.to_bytes()


# ---------------- counting (multiset) variant --------------------------------


def test_counting_minhash_exact_multiset_algebra():
    """cmtest.cpp:26-33 pattern: below fill, histogram intersection equals
    the exact Σmin/Σmax computed from Counters."""
    xs = RNG.integers(0, 50, 2_000, dtype=np.int64)
    ys = RNG.integers(25, 75, 2_000, dtype=np.int64)
    a = CountingBottomKMinHash(k=4096).update(xs)
    b = CountingBottomKMinHash(k=4096).update(ys)
    ca, cb = Counter(xs.tolist()), Counter(ys.tolist())
    keys = set(ca) | set(cb)
    s_min = sum(min(ca[k], cb[k]) for k in keys)
    s_max = sum(max(ca[k], cb[k]) for k in keys)
    assert a.histogram_intersection(b) == pytest.approx(s_min / s_max)


def test_counting_minhash_merge_equals_single_pass():
    data = RNG.integers(0, 1000, 50_000, dtype=np.int64)
    single = CountingBottomKMinHash(k=512).update(data)
    merged = merge_all(
        CountingBottomKMinHash(k=512).update(p) for p in np.array_split(data, 7)
    )
    assert merged.to_bytes() == single.to_bytes()


def test_counting_minhash_counts_accumulate():
    a = CountingBottomKMinHash(k=64)
    a.update(np.array([7, 7, 7], dtype=np.int64))
    a.update(np.array([7], dtype=np.int64))
    assert a.counts.sum() == 4


def test_tf_idf_similarity():
    xs = np.array([1, 1, 1, 2, 3], dtype=np.int64)
    ys = np.array([1, 2, 2, 4], dtype=np.int64)
    a = CountingBottomKMinHash(k=64).update(xs)
    b = CountingBottomKMinHash(k=64).update(ys)
    # uniform idf == histogram intersection
    assert a.tf_idf_similarity(b) == pytest.approx(a.histogram_intersection(b))
    # weighting shared values changes the score monotonically
    from sketch_spark.hashing import hash_tokens
    h1 = int(hash_tokens(np.array([1], dtype=np.int64))[0])
    weighted = a.tf_idf_similarity(b, idf={h1: 10.0})
    assert weighted != a.tf_idf_similarity(b)


# ---------------- k-hash-functions variant (reference stub, real here) --------


def test_kminhash_jaccard_and_merge():
    from sketch_spark.sketches.minhash import KMinHash

    a = KMinHash(k=512).update(np.arange(0, 200_000, dtype=np.int64))
    b = KMinHash(k=512).update(np.arange(100_000, 300_000, dtype=np.int64))
    # Var = J(1-J)/k → σ ≈ 0.021; allow 3σ
    assert abs(a.jaccard_index(b) - 1 / 3) < 0.07
    data = RNG.integers(0, 2**40, 100_000, dtype=np.int64)
    single = KMinHash(k=128).update(data)
    merged = merge_all(KMinHash(k=128).update(p) for p in np.array_split(data, 7))
    assert merged.to_bytes() == single.to_bytes()
    assert single.jaccard_index(single) == 1.0


def test_kminhash_empty_vs_empty_jaccard_zero():
    """Regression (round-2 advice): the _MAX sentinel must not count as a
    slot match between unfilled sketches."""
    from sketch_spark.sketches.minhash import KMinHash

    a, b = KMinHash(k=64), KMinHash(k=64)
    assert a.jaccard_index(b) == 0.0
    c = KMinHash(k=64).update(np.arange(1000, dtype=np.int64))
    assert a.jaccard_index(c) == 0.0


# ---------------- mod-sampling sketch (reference modsketch_t, mod.h) ---------


def test_modsketch_cardinality_and_jaccard():
    from sketch_spark.sketches.minhash import ModSampledSet

    n = 1_000_000
    a = ModSampledSet(m=1024).update(np.arange(n, dtype=np.int64))
    # |sample| ~ Binomial(n, 1/m): σ/n ≈ 1/√(n/m) ≈ 3.2%; allow 4σ
    assert abs(a.cardinality_estimate() - n) / n < 0.13
    b = ModSampledSet(m=1024).update(np.arange(n // 2, n + n // 2, dtype=np.int64))
    assert abs(a.jaccard_index(b) - 1 / 3) < 0.1
    assert a.containment_index(b) < 0.65  # true containment 1/2 ± noise


def test_modsketch_merge_byte_identical_and_guards():
    from sketch_spark.sketches.base import from_bytes, merge_all
    from sketch_spark.sketches.minhash import ModSampledSet

    data = np.random.default_rng(3).integers(0, 2**40, 100_000, dtype=np.int64)
    single = ModSampledSet(m=64).update(data)
    merged = merge_all(ModSampledSet(m=64).update(c) for c in np.array_split(data, 5))
    assert merged.to_bytes() == single.to_bytes()
    assert from_bytes(single.to_bytes()).to_bytes() == single.to_bytes()
    with pytest.raises(ValueError):
        ModSampledSet(m=64).merge(ModSampledSet(m=128))
    assert ModSampledSet(m=64).jaccard_index(ModSampledSet(m=64)) == 0.0
