"""VACSketch (reference vac.h:20-57): geometric level subsampling over an
HLL stack — level-0 anchor equals a plain HLL byte-for-byte, level-i
estimates track the exact E[distinct] curve, heavy values survive deep
levels, merge is levelwise max, draws resume deterministically."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.hll import HyperLogLog
from sketch_spark.sketches.vac import VACSketch


def test_level0_is_plain_hll_bytes():
    v = np.random.default_rng(0).integers(0, 2**40, 40_000, dtype=np.int64)
    sk = VACSketch(p=12, n_levels=10, seed=7).update(v)
    h = HyperLogLog(p=12, seed=7).update(v)
    assert (sk.regs[0] == h.regs).all()


def test_levels_track_expected_curve_for_singletons():
    v = np.random.default_rng(1).integers(0, 2**50, 60_000, dtype=np.int64)
    n = len(np.unique(v))
    sk = VACSketch(p=13, n_levels=8, seed=3).update(v)
    est = sk.level_estimates()
    exp = VACSketch.expected_level(np.ones(n), 8)
    for i in range(6):  # deepest levels get small-sample noisy
        # HLL noise + binomial sampling noise: 3σ_hll + 4·sqrt(exp·2^-i-ish)
        tol = 3 * sk.relative_error() * exp[i] + 4 * np.sqrt(exp[i]) + 2
        assert abs(est[i] - exp[i]) <= tol, (i, est[i], exp[i])


def test_heavy_values_survive_deep_levels():
    heavy = np.repeat(np.arange(20, dtype=np.int64), 4000)
    light = np.arange(1000, 9000, dtype=np.int64)
    sk = VACSketch(p=12, n_levels=14, seed=5).update(np.concatenate([heavy, light]))
    est = sk.level_estimates()
    exp = VACSketch.expected_level(
        np.concatenate([np.full(20, 4000.0), np.ones(8000)]), 14
    )
    # at level 9, all 20 heavy values survive (p≈1) but only ~16 singletons
    assert abs(est[9] - exp[9]) <= 0.5 * exp[9] + 10


def test_merge_is_levelwise_union():
    a = np.arange(30_000, dtype=np.int64)
    sk = merge_all(
        VACSketch(p=11, n_levels=8, seed=9).update(c) for c in np.array_split(a, 5)
    )
    assert abs(sk.estimate() - 30_000) <= 3 * sk.relative_error() * 30_000 + 1
    with pytest.raises(ValueError):
        sk.merge(VACSketch(p=11, n_levels=9, seed=9))


def test_resume_continues_draw_stream_byte_identically():
    v = np.random.default_rng(2).integers(0, 2**40, 5_000, dtype=np.int64)
    a = VACSketch(p=10, n_levels=8, seed=1)
    for c in np.array_split(v, 4):
        a.update(c)
    b = from_bytes(a.to_bytes())
    more = np.random.default_rng(3).integers(0, 2**40, 5_000, dtype=np.int64)
    a.update(more)
    b.update(more)
    assert a.to_bytes() == b.to_bytes()
