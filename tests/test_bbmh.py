"""One-permutation b-bit MinHash: cardinality + Jaccard accuracy per the
reference's own test envelope (testsrc/bbmhtest.cpp:149-165 — cardinality
within 5%, JI within ±0.05), merge laws, densification determinism."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.bbmh import BBitMinHash

RNG = np.random.default_rng(17)


@pytest.mark.parametrize("n", [100, 1_000, 100_000, 1_000_000])
def test_cardinality_within_reference_envelope(n):
    sk = BBitMinHash(p=12, b=16).update(np.arange(n, dtype=np.int64))
    assert abs(sk.cardinality_estimate() - n) / n < 0.05  # bbmhtest:149


def test_jaccard_one_third_geometry():
    a = BBitMinHash(p=12, b=16).update(np.arange(0, 200_000, dtype=np.int64))
    b = BBitMinHash(p=12, b=16).update(np.arange(100_000, 300_000, dtype=np.int64))
    assert abs(a.jaccard_index(b) - 1.0 / 3.0) < 0.05  # bbmhtest:165
    assert abs(a.union_size(b) - 300_000) / 300_000 < 0.05
    assert abs(a.intersection_size(b) - 100_000) / 100_000 < 0.15


def test_low_b_collision_correction():
    """At b=4, random collisions are 1/16 — the Li-König correction must
    keep the estimate unbiased-ish."""
    a = BBitMinHash(p=12, b=4).update(np.arange(0, 200_000, dtype=np.int64))
    b = BBitMinHash(p=12, b=4).update(np.arange(100_000, 300_000, dtype=np.int64))
    assert abs(a.jaccard_index(b) - 1.0 / 3.0) < 0.08


def test_merge_equals_single_pass_byte_identical():
    data = RNG.integers(0, 2**40, 200_000, dtype=np.int64)
    single = BBitMinHash(p=10).update(data)
    merged = merge_all(BBitMinHash(p=10).update(c) for c in np.array_split(data, 9))
    assert merged.to_bytes() == single.to_bytes()


def test_empty_and_identity():
    e = BBitMinHash(p=8)
    assert e.cardinality_estimate() == 0.0
    s = BBitMinHash(p=8).update(np.arange(1000, dtype=np.int64))
    assert s.copy().merge(e).to_bytes() == s.to_bytes()


def test_densify_deterministic():
    sk = BBitMinHash(p=10).update(np.arange(50, dtype=np.int64))  # sparse fill
    d1, d2 = sk._densified(), sk._densified()
    np.testing.assert_array_equal(d1, d2)
    assert not (d1 == np.uint64(0xFFFFFFFFFFFFFFFF)).any()


def test_self_jaccard_is_one():
    sk = BBitMinHash(p=10, b=16).update(np.arange(10_000, dtype=np.int64))
    assert sk.jaccard_index(sk) == pytest.approx(1.0)


def test_serialization_round_trip():
    sk = BBitMinHash(p=10, b=8).update(RNG.integers(0, 2**40, 5_000, dtype=np.int64))
    assert from_bytes(sk.to_bytes()).to_bytes() == sk.to_bytes()


def test_param_validation():
    with pytest.raises(ValueError):
        BBitMinHash(p=2)
    with pytest.raises(ValueError):
        BBitMinHash(p=10, b=60)  # b > 64-p
    with pytest.raises(ValueError):
        BBitMinHash(p=10).merge(BBitMinHash(p=12))


def test_empty_vs_empty_jaccard_zero():
    """Regression (round-2 advice): two never-updated sketches share the
    EMPTY sentinel in every bucket; that is no evidence of similarity."""
    a, b = BBitMinHash(p=8), BBitMinHash(p=8)
    assert a.jaccard_index(b) == 0.0
    c = BBitMinHash(p=8).update(np.arange(1000, dtype=np.int64))
    assert a.jaccard_index(c) == 0.0


# ---- DivBBitMinHash (reference DivBBitMinHasher, bbmh.h:705-774) ----------


def test_div_cardinality_at_odd_bucket_counts():
    from sketch_spark.sketches.bbmh import DivBBitMinHash

    for nb in (777, 1000, 4099):
        for n in (300, 30_000, 300_000):
            vals = RNG.integers(0, 2**62, n, dtype=np.int64)
            exact = len(np.unique(vals))
            est = DivBBitMinHash(nbuckets=nb).update(vals).cardinality_estimate()
            # harmonic/linear-count envelope ~1/sqrt(nb), generous 5σ
            assert abs(est - exact) <= 5 * exact / np.sqrt(nb) + 3, (nb, n)


def test_div_jaccard_with_collision_correction():
    from sketch_spark.sketches.bbmh import DivBBitMinHash

    a = np.arange(0, 40_000, dtype=np.int64)
    b = np.arange(20_000, 60_000, dtype=np.int64)
    sa = DivBBitMinHash(nbuckets=3000, b=16).update(a)
    sb = DivBBitMinHash(nbuckets=3000, b=16).update(b)
    assert sa.jaccard_index(sb) == pytest.approx(1 / 3, abs=0.05)
    assert sa.jaccard_index(sa) == pytest.approx(1.0)


def test_div_merge_partition_byte_identity():
    from sketch_spark.sketches.bbmh import DivBBitMinHash
    from sketch_spark.sketches.base import merge_all

    vals = RNG.integers(0, 2**62, 50_000, dtype=np.int64)
    single = DivBBitMinHash(nbuckets=777).update(vals)
    parts = [DivBBitMinHash(nbuckets=777).update(c) for c in np.array_split(vals, 6)]
    RNG.shuffle(parts)
    assert merge_all(parts).to_bytes() == single.to_bytes()


def test_div_exact_bucket_count_honored():
    """The reference rounds nbuckets up to a multiple of 64 (bbmh.h:714-721);
    we honor the requested count (documented divergence)."""
    from sketch_spark.sketches.bbmh import DivBBitMinHash

    sk = DivBBitMinHash(nbuckets=777)
    assert len(sk.vals) == 777


def test_div_param_validation_and_type_guard():
    from sketch_spark.sketches.bbmh import DivBBitMinHash

    with pytest.raises(ValueError):
        DivBBitMinHash(nbuckets=8)
    with pytest.raises(ValueError):
        DivBBitMinHash(nbuckets=1 << 20, b=40)  # not enough uniform quotient bits
    with pytest.raises(ValueError):
        DivBBitMinHash(nbuckets=1000).merge(DivBBitMinHash(nbuckets=1001))
    with pytest.raises(ValueError):  # different kind entirely
        DivBBitMinHash(nbuckets=1024).merge(BBitMinHash(p=10))
