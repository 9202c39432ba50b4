"""WeightedSketcher (reference wj::WeightedSketcher, mult.h:345-420):
multiset → (item, occurrence) set expansion over a base set sketch.
Exact Σmin/Σmax when the base bottom-k holds the whole expansion,
estimate at J(1−J)/k variance otherwise; occurrence numbering continues
across update() calls; value-partitioned merge is byte-identical to a
single pass; cross-shard overlap takes max-of-shard-weights (documented)."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, make_sketch
from sketch_spark.sketches.ws import WeightedSketcher

RNG = np.random.default_rng(42)


def _pair(k=None, l2sz=16):
    bp = {} if k is None else {"k": k}
    return (
        WeightedSketcher(base_params=bp, l2sz=l2sz),
        WeightedSketcher(base_params=bp, l2sz=l2sz),
    )


def test_exact_weighted_jaccard_when_unsaturated():
    """cmtest.cpp:26-33 pattern: capacity above the data ⇒ value-exact."""
    vocab = np.arange(800, dtype=np.uint64)
    ca = RNG.integers(0, 12, 800)
    cb = RNG.integers(0, 12, 800)
    exact = np.minimum(ca, cb).sum() / np.maximum(ca, cb).sum()
    k = int(max(ca.sum(), cb.sum())) + 1
    wa, wb = _pair(k=k)
    wa.update(vocab, counts=ca)
    wb.update(vocab, counts=cb)
    assert wa.weighted_jaccard(wb) == pytest.approx(exact, abs=1e-12)
    assert wa.total_mass() == pytest.approx(ca.sum())
    assert wb.total_mass() == pytest.approx(cb.sum())


def test_sketched_estimate_within_3sigma():
    vocab = np.arange(3000, dtype=np.uint64)
    ca = RNG.integers(1, 8, 3000)
    cb = RNG.integers(1, 8, 3000)
    exact = np.minimum(ca, cb).sum() / np.maximum(ca, cb).sum()
    wa, wb = _pair(k=1024)
    wa.update(vocab, counts=ca)
    wb.update(vocab, counts=cb)
    est = wa.weighted_jaccard(wb)
    sigma = np.sqrt(exact * (1 - exact) / 1024)
    assert abs(est - exact) <= 4 * sigma + 0.02


def test_unit_weights_reduce_to_set_jaccard():
    a = np.arange(0, 4000, dtype=np.uint64)
    b = np.arange(2000, 6000, dtype=np.uint64)
    wa, wb = _pair(k=8192)  # unsaturated ⇒ exact
    wa.update(a)
    wb.update(b)
    assert wa.weighted_jaccard(wb) == pytest.approx(2000 / 6000, abs=1e-12)


def test_occurrence_numbering_continues_across_batches():
    """mult.h:378 reads the counter before pairing: many small updates of
    the same items must equal one big update, byte-for-byte."""
    vocab = np.arange(500, dtype=np.uint64)
    inc = WeightedSketcher(base_params={"k": 4096}, l2sz=16)
    for _ in range(4):
        inc.update(vocab)
    one = WeightedSketcher(base_params={"k": 4096}, l2sz=16)
    one.update(vocab, counts=np.full(500, 4, dtype=np.int64))
    assert inc.to_bytes() == one.to_bytes()


def test_value_partitioned_merge_byte_identical():
    vocab = np.arange(1200, dtype=np.uint64)
    cnt = RNG.integers(1, 9, 1200)
    single = WeightedSketcher(base_params={"k": 16384}, l2sz=16)
    single.update(vocab, counts=cnt)
    parts = []
    for sl in (slice(0, 400), slice(400, 900), slice(900, 1200)):
        w = WeightedSketcher(base_params={"k": 16384}, l2sz=16)
        w.update(vocab[sl], counts=cnt[sl])
        parts.append(w)
    merged = parts[0].merge(parts[1]).merge(parts[2])
    assert merged.to_bytes() == single.to_bytes()


def test_cross_shard_overlap_takes_max_of_weights():
    """Documented merge semantics: both shards number occurrences from 1,
    so the union's weight for a shared item is the max, not the sum."""
    x = np.array([7], dtype=np.uint64)
    a = WeightedSketcher(base_params={"k": 64}, l2sz=16)
    a.update(x, counts=np.array([3]))
    b = WeightedSketcher(base_params={"k": 64}, l2sz=16)
    b.update(x, counts=np.array([5]))
    a.merge(b)
    # expanded union = {(x,1)..(x,5)} — 5 distinct pairs, not 8
    assert len(a.base.values) == 5
    assert a.total_mass() == pytest.approx(5.0)


def test_weighted_equals_repeat_stream():
    """counts= pre-aggregation is byte-identical to feeding the raw
    repeated stream (same expansion either way)."""
    vocab = np.arange(300, dtype=np.uint64)
    cnt = RNG.integers(1, 6, 300)
    agg = WeightedSketcher(base_params={"k": 4096}, l2sz=16)
    agg.update(vocab, counts=cnt)
    raw = WeightedSketcher(base_params={"k": 4096}, l2sz=16)
    raw.update(np.repeat(vocab, cnt))
    assert agg.to_bytes() == raw.to_bytes()


def test_alternative_bases():
    """Any Jaccard-capable set sketch plugs in (bbmh, smh)."""
    vocab = np.arange(4000, dtype=np.uint64)
    ca = RNG.integers(1, 5, 4000)
    cb = RNG.integers(1, 5, 4000)
    exact = np.minimum(ca, cb).sum() / np.maximum(ca, cb).sum()
    for kind, params in (("bbmh", {"p": 12, "b": 16}), ("smh", {"m": 2048})):
        wa = WeightedSketcher(base_kind=kind, base_params=params, l2sz=16)
        wb = WeightedSketcher(base_kind=kind, base_params=params, l2sz=16)
        wa.update(vocab, counts=ca)
        wb.update(vocab, counts=cb)
        assert abs(wa.weighted_jaccard(wb) - exact) <= 0.08, kind


def test_roundtrip_and_factory():
    w = make_sketch("ws", base_kind="minhash", base_params={"k": 256})
    w.update(np.arange(100, dtype=np.uint64), counts=np.full(100, 2))
    r = from_bytes(w.to_bytes())
    assert r.to_bytes() == w.to_bytes()
    assert r.weighted_jaccard(w) == pytest.approx(1.0)


def test_param_mismatch_raises():
    a = WeightedSketcher(base_params={"k": 128})
    b = WeightedSketcher(base_params={"k": 256})
    with pytest.raises(ValueError):
        a.merge(b)
    c = WeightedSketcher(base_kind="bbmh", base_params={"p": 10, "b": 8})
    with pytest.raises(ValueError):
        a.merge(c)


def test_est_count_upper_bounds_truth():
    vocab = np.arange(2000, dtype=np.uint64)
    cnt = RNG.integers(0, 20, 2000)
    w = WeightedSketcher(base_params={"k": 64}, l2sz=14)
    w.update(vocab, counts=cnt)
    est = w.est_count(vocab)
    assert (est >= cnt).all()  # CMS never underestimates


def test_xxh3_pair_hasher_weighted_jaccard():
    """pair_hasher='xxh3' (XXH3PairHasher, hash.h:812-820): same expanded-
    set semantics through a different pair hash — exact Σmin/Σmax on an
    unsaturated bottom-k base, and a different state than 'wang'."""
    a_items = np.arange(100, dtype=np.int64)
    a_w = np.arange(1, 101, dtype=np.int64)
    b_items = np.arange(50, 150, dtype=np.int64)
    b_w = np.full(100, 60, dtype=np.int64)
    # exact sums over union
    wa = {int(i): int(w) for i, w in zip(a_items, a_w)}
    wb = {int(i): int(w) for i, w in zip(b_items, b_w)}
    keys = set(wa) | set(wb)
    smin = sum(min(wa.get(k, 0), wb.get(k, 0)) for k in keys)
    smax = sum(max(wa.get(k, 0), wb.get(k, 0)) for k in keys)
    big_k = {"base_params": {"k": 1 << 16}}  # unsaturated: bottom-k is exact
    sa = WeightedSketcher(pair_hasher="xxh3", **big_k).update(a_items, counts=a_w)
    sb = WeightedSketcher(pair_hasher="xxh3", **big_k).update(b_items, counts=b_w)
    assert sa.weighted_jaccard(sb) == pytest.approx(smin / smax, abs=1e-12)
    sw = WeightedSketcher(pair_hasher="wang", **big_k).update(a_items, counts=a_w)
    assert sw.to_bytes() != sa.to_bytes()


def test_xxh3_pair_hasher_roundtrip_and_merge_guard():
    sk = make_sketch("ws", pair_hasher="xxh3", l2sz=12)
    sk.update(np.arange(50, dtype=np.int64), counts=np.full(50, 3))
    r = from_bytes(sk.to_bytes())
    assert r.pair_hasher == "xxh3" and r.to_bytes() == sk.to_bytes()
    with pytest.raises(ValueError):
        sk.merge(make_sketch("ws", pair_hasher="wang", l2sz=12))
    with pytest.raises(ValueError):
        WeightedSketcher(pair_hasher="nope")
