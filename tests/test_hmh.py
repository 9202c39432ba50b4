"""HyperMinHash (working version of the reference's draft, mh.h:943-1283;
Yu & Weber arXiv:1710.08436): HLL-grade cardinality + collision-corrected
Jaccard from one max-monoid register array."""

import itertools

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.hmh import HyperMinHash


@pytest.mark.parametrize("n", [1_000, 100_000, 1_000_000])
def test_cardinality_within_hll_bound(n):
    h = HyperMinHash(p=12, r=8).update(np.arange(n, dtype=np.int64))
    assert abs(h.estimate() - n) <= 3 * h.relative_error() * n


@pytest.mark.parametrize("p,r", [(10, 8), (12, 8), (12, 12)])
def test_jaccard_one_third(p, r):
    n = 100_000
    a = np.arange(0, n, dtype=np.int64)
    b = np.arange(n // 2, n + n // 2, dtype=np.int64)
    sa = HyperMinHash(p=p, r=r).update(a)
    sb = HyperMinHash(p=p, r=r).update(b)
    # filled-bucket match fraction: σ ≈ √(J(1−J)/m); correction residual small
    sigma = np.sqrt((1 / 3) * (2 / 3) / (1 << p))
    assert abs(sa.jaccard_index(sb) - 1 / 3) < 4 * sigma + 0.01


def test_merge_equals_single_pass_byte_identical():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 2**40, 50_000, dtype=np.int64)
    single = HyperMinHash(p=10).update(data)
    merged = merge_all(HyperMinHash(p=10).update(c) for c in np.array_split(data, 7))
    assert merged.to_bytes() == single.to_bytes()
    parts = np.array_split(data, 4)
    for perm in itertools.permutations(range(4)):
        m = merge_all(HyperMinHash(p=10).update(parts[i]) for i in perm)
        assert m.to_bytes() == single.to_bytes()


def test_rho_ties_keep_min_fraction():
    """The documented divergence from the draft (mh.h:1194-1196 keeps the
    max full encoding = max fraction on ρ ties): the published analysis
    needs the MIN fraction, which our ~frac encoding yields."""
    h = HyperMinHash(p=4, r=8)
    mask = (1 << 8) - 1
    # craft two updates landing in the same bucket with equal rank
    h.regs[3] = np.uint32((5 << 8) | (mask - 100))  # frac 100
    g = HyperMinHash(p=4, r=8)
    g.regs[3] = np.uint32((5 << 8) | (mask - 40))  # frac 40 → larger encoding
    h.merge(g)
    assert int(h.regs[3]) == (5 << 8) | (mask - 40)  # min fraction wins


def test_roundtrip_empty_and_params():
    s = HyperMinHash(p=8, r=6, seed=3).update(np.arange(500, dtype=np.int64))
    assert from_bytes(s.to_bytes()).to_bytes() == s.to_bytes()
    e = HyperMinHash(p=8, r=6)
    assert e.jaccard_index(e) == 0.0
    assert e.estimate() == pytest.approx(0.0, abs=1e-9)
    with pytest.raises(ValueError):
        HyperMinHash(p=2)
    with pytest.raises(ValueError):
        HyperMinHash(p=8).merge(HyperMinHash(p=9))


def test_intersection_size():
    n = 50_000
    a = np.arange(0, n, dtype=np.int64)
    b = np.arange(n // 2, n + n // 2, dtype=np.int64)
    sa = HyperMinHash(p=12).update(a)
    sb = HyperMinHash(p=12).update(b)
    inter = sa.intersection_size(sb)
    assert abs(inter - n / 2) / (n / 2) < 0.1
