"""Counting Bloom stack (reference cbfbase_t, cbf.h:33-110): log-scale
per-item counts via Bloom-membership Morris counters — first-hit membership
is deterministic (no false negatives), counts scale ~2^depth, levels merge
by OR with the documented split-factor-low envelope, draws resume
deterministically."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.cbf import CountingBloomStack


def test_membership_no_false_negatives_and_absent_zero():
    v = np.random.default_rng(0).integers(0, 2**40, 5_000, dtype=np.int64)
    sk = CountingBloomStack(l2sz=16, n_levels=8).update(v)
    assert bool(sk.may_contain(v).all())
    absent = np.arange(10**12, 10**12 + 2_000, dtype=np.int64)
    # bloom FPs only: tiny at this fill
    assert sk.est_count(absent).mean() < 0.05


def test_counts_scale_log2_with_occurrences():
    """est = 2^(deepest level − 1) (cbf.h:80-85): reaching depth d costs
    ~2^(d+1) hits, so the reference's estimator sits near n/4 — assert the
    order of magnitude across 4 decades."""
    for n, lo, hi in ((1, 1, 1), (100, 8, 256), (10_000, 512, 32_768)):
        sk = CountingBloomStack(l2sz=14, n_levels=18, seed=7)
        sk.update(np.full(n, 42, dtype=np.int64))
        est = sk.est_count(np.array([42]))[0]
        assert lo <= est <= hi, (n, est)


def test_weighted_counts_equivalent():
    """counts= path == feeding the occurrences individually (same unique
    collapse, same draw stream)."""
    a = CountingBloomStack(l2sz=12, n_levels=10, seed=3).update(
        np.array([5], dtype=np.int64), counts=np.array([3000])
    )
    b = CountingBloomStack(l2sz=12, n_levels=10, seed=3).update(
        np.full(3000, 5, dtype=np.int64)
    )
    assert a.to_bytes() == b.to_bytes()


def test_merge_is_levelwise_or_with_split_envelope():
    n, P = 8_000, 8
    one = CountingBloomStack(l2sz=12, n_levels=14, seed=3).update(
        np.full(n, 9, dtype=np.int64)
    )
    parts = [
        CountingBloomStack(l2sz=12, n_levels=14, seed=3).update(
            np.full(n // P + 173 * (i - P // 2), 9, dtype=np.int64)
        )
        for i in range(P)
    ]
    m = merge_all(parts)
    est = m.est_count(np.array([9]))[0]
    # documented: merged runs low by up to the split factor on top of the
    # reference estimator's own ~n/4 center
    assert n / (16.0 * P) <= est <= n * 16.0, est
    assert one.est_count(np.array([9]))[0] >= est / 16
    with pytest.raises(ValueError):
        m.merge(CountingBloomStack(l2sz=12, n_levels=13, seed=3))


def test_resume_continues_byte_identically():
    v = np.full(200, 7, dtype=np.int64)
    a = CountingBloomStack(l2sz=12, n_levels=10, seed=1)
    for _ in range(10):
        a.update(v)
    b = from_bytes(a.to_bytes())
    for _ in range(10):
        a.update(v)
        b.update(v)
    assert a.to_bytes() == b.to_bytes()


def test_shrinking_level_sizes():
    sk = CountingBloomStack(l2sz=16, n_levels=8, shrink=True)
    sizes = [bf.l2sz for bf in sk.levels]
    assert sizes == [16, 15, 14, 13, 12, 11, 10, 10]


# ---------------- pcbf: cbf + per-level HLL pairs (cbf.h:115-201) -----------


def test_pcbf_level_cardinalities_separate_heavy_from_light():
    from sketch_spark.sketches.cbf import ProbabilisticCountingBloom

    heavy = np.repeat(np.arange(50, dtype=np.int64), 2_000)
    light = np.arange(1_000, 6_000, dtype=np.int64)
    sk = ProbabilisticCountingBloom(l2sz=14, n_levels=12, hllp=12).update(
        np.concatenate([heavy, light])
    )
    cards = sk.level_cardinalities()
    assert abs(cards[0] - 5_050) <= 0.05 * 5_050      # every distinct item
    assert abs(cards[4] - 50) <= 15                    # only the heavy ones deep
    assert bool(sk.may_contain(light).all())


def test_pcbf_merge_and_roundtrip():
    from sketch_spark.sketches.base import from_bytes, merge_all
    from sketch_spark.sketches.cbf import ProbabilisticCountingBloom

    n, P = 6_000, 6
    parts = [
        ProbabilisticCountingBloom(l2sz=12, n_levels=10, hllp=10, seed=5).update(
            np.full(n // P + 97 * i, 7, dtype=np.int64)
        )
        for i in range(P)
    ]
    m = merge_all(parts)
    est = m.est_count(np.array([7]))[0]
    assert n / (16.0 * P) <= est <= n * 16.0
    assert from_bytes(m.to_bytes()).to_bytes() == m.to_bytes()
    with pytest.raises(ValueError):
        m.merge(ProbabilisticCountingBloom(l2sz=12, n_levels=10, hllp=11, seed=5))
