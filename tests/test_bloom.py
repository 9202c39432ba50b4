"""Bloom filter: no false negatives, measured FPR vs the popcount estimate,
OR-merge laws, fill-ratio cardinality, set algebra.

Reference analogs: testsrc/bftest.cpp:13-52 (insert s1: all hit; probe
disjoint s2: measure FPR; self-jaccard == 1), bf.h:486-511 (merge |=),
bf.h:73-76 (cardinality), bf.h:199-202 (FPR estimate)."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.bloom import BloomFilter, optimal_nhashes

RNG = np.random.default_rng(1337)

PRESENT = RNG.integers(0, 10_000_000, 20_000, dtype=np.int64)
ABSENT = RNG.integers(10_000_000, 20_000_000, 20_000, dtype=np.int64)


def test_no_false_negatives():
    bf = BloomFilter(l2sz=18, nh=4).update(PRESENT)
    assert bf.may_contain(PRESENT).all()


def test_measured_fpr_within_estimate():
    bf = BloomFilter(l2sz=18, nh=4).update(PRESENT)
    measured = float(bf.may_contain(ABSENT).mean())
    est = bf.est_fpr()
    assert measured <= 3.0 * est + 1e-3
    # and the estimate itself is sane for ~19k distinct in 2^18 bits / 4 hashes
    assert est < 0.05


def test_empty_filter_contains_nothing():
    bf = BloomFilter(l2sz=12, nh=3)
    assert not bf.may_contain(ABSENT[:100]).any()
    assert bf.cardinality_estimate() == pytest.approx(0.0)


def test_cardinality_from_fill_ratio():
    n_distinct = len(np.unique(PRESENT))
    bf = BloomFilter(l2sz=20, nh=4).update(PRESENT)
    assert abs(bf.cardinality_estimate() - n_distinct) / n_distinct < 0.05


def test_merge_equals_single_pass_byte_identical():
    parts = np.array_split(PRESENT, 7)
    merged = merge_all(BloomFilter(l2sz=16, nh=4).update(p) for p in parts)
    single = BloomFilter(l2sz=16, nh=4).update(PRESENT)
    assert merged.to_bytes() == single.to_bytes()


def test_merge_associative_commutative():
    a = BloomFilter(l2sz=14, nh=3).update(PRESENT[:5000])
    b = BloomFilter(l2sz=14, nh=3).update(PRESENT[5000:10000])
    c = BloomFilter(l2sz=14, nh=3).update(ABSENT[:5000])
    assert a.copy().merge(b).merge(c).to_bytes() == a.copy().merge(b.copy().merge(c)).to_bytes()
    assert a.copy().merge(b).to_bytes() == b.copy().merge(a).to_bytes()


def test_merge_mismatch_raises():
    with pytest.raises(ValueError):
        BloomFilter(l2sz=14, nh=3).merge(BloomFilter(l2sz=15, nh=3))
    with pytest.raises(ValueError):
        BloomFilter(l2sz=14, nh=3, seed=1).merge(BloomFilter(l2sz=14, nh=3, seed=2))


def test_set_algebra_union_intersection_jaccard():
    """A=[0,20k), B=[10k,30k): true union 30k, intersection 10k, JI=1/3."""
    a = BloomFilter(l2sz=20, nh=4).update(np.arange(0, 20_000, dtype=np.int64))
    b = BloomFilter(l2sz=20, nh=4).update(np.arange(10_000, 30_000, dtype=np.int64))
    assert abs(a.union_size(b) - 30_000) / 30_000 < 0.05
    assert abs(a.intersection_size(b) - 10_000) / 10_000 < 0.15
    assert abs(a.jaccard_index(b) - 1.0 / 3.0) < 0.05
    assert a.jaccard_index(a) == pytest.approx(1.0, abs=0.01)  # bftest.cpp:43


def test_optimal_nhashes():
    # ln2 * m/n (bf.h:15-20)
    assert optimal_nhashes(1 << 20, 100_000) == round(np.log(2) * (1 << 20) / 100_000)
    assert optimal_nhashes(1 << 10, 0) >= 1


def test_serialization_round_trip():
    bf = BloomFilter(l2sz=16, nh=4).update(PRESENT[:1000])
    bf2 = from_bytes(bf.to_bytes())
    assert bf2.to_bytes() == bf.to_bytes()
    np.testing.assert_array_equal(
        bf2.may_contain(PRESENT[:1000]), bf.may_contain(PRESENT[:1000])
    )


def test_intersect_and_symmetric_difference():
    a = BloomFilter(l2sz=16, nh=3).update(np.arange(0, 2000, dtype=np.int64))
    b = BloomFilter(l2sz=16, nh=3).update(np.arange(1000, 3000, dtype=np.int64))
    inter = a.copy()
    inter.intersect(b)
    # no false negatives on the true intersection
    assert inter.may_contain(np.arange(1000, 2000, dtype=np.int64)).all()
    xor = a.copy()
    xor.symmetric_difference(b)
    # xor popcount ≈ bits unique to either side
    assert xor.popcount() > 0
    both = a.copy()
    both.intersect(a)
    assert both.to_bytes() == a.to_bytes()  # idempotent with self


def test_flags_and_byte_or_scatter_paths_bit_identical():
    """update() picks between the unpack/scatter/repack path (big batches)
    and in-place byte OR (small batches) on a work gate; both must produce
    the same bits. Drive the same filter through each path explicitly."""
    from sketch_spark.sketches.bloom import BloomFilter

    rng = np.random.default_rng(99)
    vals = rng.integers(0, 1 << 40, 300_000, dtype=np.int64)
    big = BloomFilter(l2sz=16, nh=3, seed=5)  # 64k bits: one big batch -> flags path
    big.update(vals)
    # work gate: flags path iff len(v)*nh >= m>>6 (= 1024 here), so batches
    # of 100 (300 hashes) genuinely take the byte-OR branch
    assert 100 * 3 < (1 << 16) >> 6
    small = BloomFilter(l2sz=16, nh=3, seed=5)
    for i in range(0, len(vals), 100):  # tiny batches -> byte-OR path
        small.update(vals[i : i + 100])
    np.testing.assert_array_equal(big.words, small.words)
    assert big.to_bytes() == small.to_bytes()


def test_saturation_warns_and_sizing_helpers():
    import warnings

    from sketch_spark.sketches import bloom as bloom_mod
    from sketch_spark.sketches.base import make_sketch

    # over-full filter: tiny m, lots of distinct keys -> fill > 0.8
    bf = make_sketch("bloom", l2sz=8, nh=4)
    bf.update(np.arange(2_000, dtype=np.int64))
    assert bf.popcount() / bf.m >= bloom_mod.SATURATION_FILL
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bf.cardinality_estimate()
        bf.est_fpr()
        bf.may_contain(np.arange(10, dtype=np.int64))
    sat = [x for x in w if issubclass(x.category, RuntimeWarning)]
    assert len(sat) == 1  # loud once, not per call
    assert "optimal_params" in str(sat[0].message)

    # a healthy filter never warns
    ok = make_sketch("bloom", l2sz=14, nh=4).update(np.arange(100, dtype=np.int64))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ok.cardinality_estimate()
    assert not [x for x in w if issubclass(x.category, RuntimeWarning)]

    # sizing helper: measured FPR of a filter sized by it lands near target
    n, fpr = 50_000, 0.01
    params = bloom_mod.optimal_params(n, fpr)
    sized = make_sketch("bloom", **params).update(np.arange(n, dtype=np.int64))
    probes = np.arange(n, n + 100_000, dtype=np.int64)  # all absent
    measured = float(sized.may_contain(probes).mean())
    assert measured <= 3 * fpr
    assert sized.popcount() / sized.m < bloom_mod.SATURATION_FILL

    # sizing from an HLL pre-estimate matches sizing from the true count
    hll = make_sketch("hll", p=14).update(np.arange(n, dtype=np.int64))
    from_hll = bloom_mod.size_for_hll(hll, fpr)
    assert abs(from_hll["l2sz"] - params["l2sz"]) <= 1


def test_popcount_table_path_matches_unpackbits():
    from sketch_spark.sketches import bloom as bloom_mod

    rng = np.random.default_rng(7)
    for n_words in (1, 3, 1000):
        words = rng.integers(0, 1 << 63, size=n_words, dtype=np.int64).astype(np.uint64)
        exact = int(np.unpackbits(words.view(np.uint8)).sum())
        assert bloom_mod._popcount(words) == exact
    assert bloom_mod._popcount(np.zeros(4, dtype=np.uint64)) == 0
    assert bloom_mod._popcount(np.full(4, ~np.uint64(0))) == 256


def test_sampled_fill_bounded_and_accurate():
    """may_contain's advisory saturation check reads a bounded word prefix —
    for filters under the sample size it is exact, and for larger ones the
    uniform-hash fill makes the prefix an accurate estimator."""
    from sketch_spark.sketches.base import make_sketch

    small = make_sketch("bloom", l2sz=10, nh=2).update(np.arange(300, dtype=np.int64))
    assert small._sampled_fill() == small.popcount() / small.m

    big = make_sketch("bloom", l2sz=23, nh=2)  # 2^17 words > sample prefix
    big.update(np.arange(2_000_000, dtype=np.int64))
    assert big.words.size > big._FILL_SAMPLE_WORDS
    true_fill = big.popcount() / big.m
    assert abs(big._sampled_fill() - true_fill) < 0.01
