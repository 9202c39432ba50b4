"""SuperMinHash (reference bbmh.h:470-697 capability; Ertl arXiv:1706.05698):
accuracy vs known-overlap sets, byte-identical merge laws under any
partitioning (the Spark-correctness theorem), round-trip, edge cases."""

import itertools

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.smh import SuperMinHash


def _overlap_sets(n, j):
    """Two integer ranges with exact Jaccard j (reference mhtest fixture
    style): |∩| = u·j where u = |A∪B|."""
    inter = int(n * j / (1 + j))
    a = np.arange(0, n, dtype=np.int64)
    b = np.arange(n - inter, 2 * n - inter, dtype=np.int64)
    true = inter / (2 * n - inter)
    return a, b, true


@pytest.mark.parametrize("m", [512, 1024])
def test_jaccard_one_third(m):
    a, b, true = _overlap_sets(60_000, 1 / 3)
    sa = SuperMinHash(m=m).update(a)
    sb = SuperMinHash(m=m).update(b)
    # Ertl: Var < J(1-J)/m (strictly better than k-minwise); allow 4σ
    sigma = np.sqrt(true * (1 - true) / m)
    assert abs(sa.jaccard_index(sb) - true) < 4 * sigma


def test_merge_equals_single_pass_byte_identical():
    rng = np.random.default_rng(11)
    data = rng.integers(0, 2**40, 30_000, dtype=np.int64)
    single = SuperMinHash(m=256).update(data)
    merged = merge_all(SuperMinHash(m=256).update(p) for p in np.array_split(data, 9))
    assert merged.to_bytes() == single.to_bytes()


def test_all_merge_orders_byte_identical():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 2**40, 8_000, dtype=np.int64)
    single = SuperMinHash(m=128).update(data)
    parts = np.array_split(data, 4)
    for perm in itertools.permutations(range(4)):
        merged = merge_all(SuperMinHash(m=128).update(parts[i]) for i in perm)
        assert merged.to_bytes() == single.to_bytes(), perm


def test_early_stop_equals_cold_build():
    """Feeding data in two chunks (warm sketch → small `a` prefix) must give
    the same bytes as one cold full-permutation pass."""
    rng = np.random.default_rng(5)
    data = rng.integers(0, 2**40, 20_000, dtype=np.int64)
    cold = SuperMinHash(m=512).update(data)
    warm = SuperMinHash(m=512)
    for chunk in np.array_split(data, 40):  # many small warm updates
        warm.update(chunk)
    assert warm.to_bytes() == cold.to_bytes()


def test_self_and_empty_jaccard():
    s = SuperMinHash(m=128).update(np.arange(1000, dtype=np.int64))
    assert s.jaccard_index(s) == 1.0
    e = SuperMinHash(m=128)
    assert e.jaccard_index(e) == 0.0
    assert e.jaccard_index(s) == 0.0


def test_roundtrip_and_param_checks():
    s = SuperMinHash(m=64, seed=9).update(np.arange(100, dtype=np.int64))
    assert from_bytes(s.to_bytes()).to_bytes() == s.to_bytes()
    with pytest.raises(ValueError):
        SuperMinHash(m=4)
    with pytest.raises(ValueError):
        SuperMinHash(m=64).merge(SuperMinHash(m=128))
    with pytest.raises(ValueError):
        SuperMinHash(m=64).merge(SuperMinHash(m=64, seed=1))


def test_duplicates_do_not_change_state():
    a = np.arange(500, dtype=np.int64)
    s1 = SuperMinHash(m=128).update(a)
    s2 = SuperMinHash(m=128).update(np.repeat(a, 3))
    assert s1.to_bytes() == s2.to_bytes()
