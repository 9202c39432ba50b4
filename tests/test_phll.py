"""phll (reference phll_t, bbmh.h:136-230): 4-bit base-16 packed registers,
nibble-max merge (a true max-monoid ⇒ partition byte-identity), MLE
cardinality unbiased at σ ≈ 1.5/√m, union/Jaccard by inclusion-exclusion.
The reference's own estimator is unfinished (TODO at bbmh.h:1086) and its
quantizer wraps for sparse buckets — divergences documented in phll.py."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, make_sketch, merge_all
from sketch_spark.sketches.phll import PackedHLL

RNG = np.random.default_rng(99)


@pytest.mark.parametrize("n", [50, 1000, 30_000, 500_000])
def test_cardinality_within_4sigma(n):
    vals = RNG.integers(0, 2**63, n, dtype=np.int64)
    exact = len(np.unique(vals))
    sk = PackedHLL(p=12).update(vals)
    assert abs(sk.estimate() - exact) <= 4 * sk.relative_error() * exact + 3


def test_sparse_buckets_not_inverted():
    """The reference quantizer wraps buckets with min-hash > 2^60 to the
    'most full' register (bbmh.h:1091-1096 uint8 underflow); ours must
    keep a handful of items reading as a handful."""
    sk = PackedHLL(p=12).update(np.arange(40, dtype=np.int64))
    assert 30 <= sk.estimate() <= 50
    # most slots empty, occupied slots at plausible low ranks
    assert (sk.regs == 0).sum() >= (1 << 12) - 40


def test_register_saturation_at_15():
    """Register 15 is the censored tail (rank ≥ 15 ⇔ ~16^14 items per
    bucket — unreachable with real data, so drive the likelihood term
    directly): a fully-saturated register file must yield a huge finite
    estimate that dominates any unsaturated file's."""
    sat = PackedHLL(p=8)
    sat.regs[:] = 15
    big = sat.estimate()
    assert np.isfinite(big)
    mid = PackedHLL(p=8)
    mid.regs[:] = 10
    assert big > mid.estimate() > 0
    # and a partially-saturated file still estimates monotonically
    half = PackedHLL(p=8)
    half.regs[: 1 << 7] = 15
    half.regs[1 << 7 :] = 10
    assert mid.estimate() < half.estimate() < big


def test_union_and_jaccard():
    a = np.arange(0, 60_000, dtype=np.int64)
    b = np.arange(30_000, 90_000, dtype=np.int64)
    sa, sb = PackedHLL(p=12).update(a), PackedHLL(p=12).update(b)
    tol = 4 * sa.relative_error()
    assert sa.union_size(sb) == pytest.approx(90_000, rel=4 * tol)
    assert sa.jaccard_index(sb) == pytest.approx(1 / 3, abs=6 * tol)
    only_a, only_b, inter = sa.full_set_comparison(sb)
    assert inter == pytest.approx(30_000, rel=10 * tol)


def test_merge_partition_byte_identity():
    vals = RNG.integers(0, 2**62, 80_000, dtype=np.int64)
    single = PackedHLL(p=11).update(vals)
    parts = [PackedHLL(p=11).update(c) for c in np.array_split(vals, 9)]
    RNG.shuffle(parts)
    assert merge_all(parts).to_bytes() == single.to_bytes()


def test_wire_nibble_packing_roundtrip():
    sk = PackedHLL(p=10).update(RNG.integers(0, 2**62, 5000, dtype=np.int64))
    r = from_bytes(sk.to_bytes())
    assert isinstance(r, PackedHLL)
    assert (r.regs == sk.regs).all()
    assert r.to_bytes() == sk.to_bytes()
    # in-memory m nibbles ride as m/2 wire bytes (bbmh.h:1098 layout)
    assert sk._arrays()["packed"].nbytes == (1 << 10) // 2


def test_param_mismatch_and_factory():
    a = make_sketch("phll", p=10)
    b = make_sketch("phll", p=11)
    with pytest.raises(ValueError):
        a.merge(b)
    with pytest.raises(ValueError):
        PackedHLL(p=2)
