"""HeavyKeeper (reference hk.h:21-253, USENIX ATC'18): fingerprint+counter
heavy-hitter registers with deterministic batch-mode competition (the
reference's probabilistic per-item decay is stream-order dependent —
restatement documented in hk.py) and the corrected merge rule (the
reference's |= cannot compile, typo hk.h:224)."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, make_sketch, merge_all
from sketch_spark.sketches.hk import HeavyKeeper

RNG = np.random.default_rng(123)


def _zipf_stream():
    heavy = np.repeat(np.arange(20, dtype=np.int64), 5000)
    light = RNG.integers(100, 10_100, 40_000)
    s = np.concatenate([heavy, light])
    RNG.shuffle(s)
    return s


def test_heavy_hitters_recovered_in_contended_regime():
    s = _zipf_stream()
    sk = HeavyKeeper(nbuckets=4096, nh=4)
    for c in np.array_split(s, 7):
        sk.update(c)
    est = sk.query(np.arange(20))
    assert np.abs(est - 5000).max() <= 0.05 * 5000  # heavy counters survive decay
    # light keys do not masquerade as heavy
    light_est = sk.query(np.arange(200, 400))
    assert (light_est < 2500).all()


def test_exact_when_sized_above_distinct():
    """nbuckets ≳ 4× distinct keys ⇒ singly-occupied cells ⇒ exact counts
    (the value-exact gate shape, like the MG capacity-from-data gate)."""
    s = _zipf_stream()
    sk = HeavyKeeper(nbuckets=1 << 16, nh=4).update(s)
    assert (sk.query(np.arange(20)) == 5000).all()


def test_partitioned_merge_preserves_heavies():
    s = _zipf_stream()
    parts = [HeavyKeeper(nbuckets=1 << 16, nh=4).update(c) for c in np.array_split(s, 8)]
    RNG.shuffle(parts)
    m = merge_all(parts)
    assert (m.query(np.arange(20)) == 5000).all()


def test_deterministic_and_weighted_equals_repeat():
    s = _zipf_stream()
    a = HeavyKeeper(nbuckets=4096, nh=4)
    b = HeavyKeeper(nbuckets=4096, nh=4)
    for c in np.array_split(s, 7):
        a.update(c)
        b.update(c)
    assert a.to_bytes() == b.to_bytes()
    wa = HeavyKeeper(nbuckets=2048).update(np.arange(50), counts=np.full(50, 7))
    wb = HeavyKeeper(nbuckets=2048).update(np.repeat(np.arange(50), 7))
    assert wa.to_bytes() == wb.to_bytes()


def test_merge_competition_rule():
    """Same fp adds; different fp keeps the larger count's fp at
    max − min; exact ties clear the cell (hk.h:214-245 intent)."""
    a = HeavyKeeper(nbuckets=64, nh=1)
    b = HeavyKeeper(nbuckets=64, nh=1)
    a.counts[0, 5], a.fps[0, 5] = 100, 7
    b.counts[0, 5], b.fps[0, 5] = 30, 7
    a.merge(b)
    assert a.counts[0, 5] == 130 and a.fps[0, 5] == 7
    c = HeavyKeeper(nbuckets=64, nh=1)
    c.counts[0, 5], c.fps[0, 5] = 50, 9  # different fp, smaller count
    a.merge(c)
    assert a.counts[0, 5] == 80 and a.fps[0, 5] == 7
    d = HeavyKeeper(nbuckets=64, nh=1)
    d.counts[0, 5], d.fps[0, 5] = 80, 11  # exact tie → cell cleared
    a.merge(d)
    assert a.counts[0, 5] == 0 and a.fps[0, 5] == 0


def test_counter_saturation():
    sk = HeavyKeeper(nbuckets=64, nh=1, ctrbits=8)
    sk.update(np.zeros(1000, dtype=np.int64))  # 1000 > 2^8-1
    assert sk.query(np.array([0]))[0] == 255


def test_roundtrip_factory_and_validation():
    sk = make_sketch("hk", nbuckets=777, nh=3)
    sk.update(RNG.integers(0, 1000, 5000))
    assert from_bytes(sk.to_bytes()).to_bytes() == sk.to_bytes()
    with pytest.raises(ValueError):
        HeavyKeeper(nbuckets=4)
    with pytest.raises(ValueError):
        HeavyKeeper(fpbits=0)
    with pytest.raises(ValueError):
        HeavyKeeper(nbuckets=777).merge(HeavyKeeper(nbuckets=778))
