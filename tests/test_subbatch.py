"""The generic @subbatched wrapper (sketches/base.py) and the per-kind
explicit sub-batch loops: updates bigger than UPDATE_SUPER are processed in
slices with byte-identical results for the split-invariant kinds. Every
kernel reads base.UPDATE_SUPER at CALL time (module attribute, not an
import-bound copy) so a single monkeypatch here exercises all of them at
test-sized inputs."""

import numpy as np
import pytest

import sketch_spark.sketches.base as base_mod
from sketch_spark.sketches.base import make_sketch

# kinds whose update() is byte-identical under any batch split, covering
# both @subbatched wrappers and the kernels with their own explicit
# UPDATE_SUPER loops (bbmh/divbbmh/counting_minhash/ddsketch)
SPLIT_INVARIANT = (
    ("ws", {}),
    ("smh", {"m": 128}),
    ("realccm", {"l2sz": 10, "nh": 4}),
    ("bbmh", {"p": 8, "b": 8}),
    ("divbbmh", {"nbuckets": 200, "b": 8}),
    ("counting_minhash", {"k": 256}),
    ("ddsketch", {}),
)


@pytest.mark.parametrize("kind,kw", SPLIT_INVARIANT, ids=[k for k, _ in SPLIT_INVARIANT])
def test_subbatched_update_is_byte_identical(kind, kw, monkeypatch):
    rng = np.random.default_rng(9)
    if kind == "ddsketch":
        vals = rng.uniform(0.01, 5_000.0, size=10_123)
    else:
        vals = rng.integers(0, 3_000, size=10_123, dtype=np.int64)
    whole = make_sketch(kind, **kw).update(vals)  # UPDATE_SUPER >> n: one call
    monkeypatch.setattr(base_mod, "UPDATE_SUPER", 1_000)  # 11 inner slices
    split = make_sketch(kind, **kw).update(vals)
    assert split.to_bytes() == whole.to_bytes()


def test_counting_minhash_weighted_slices_with_values(monkeypatch):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 500, size=4_096, dtype=np.int64)
    w = rng.integers(1, 5, size=4_096).astype(np.int64)
    whole = make_sketch("counting_minhash", k=256).update(vals, counts=w)
    monkeypatch.setattr(base_mod, "UPDATE_SUPER", 777)
    split = make_sketch("counting_minhash", k=256).update(vals, counts=w)
    assert split.to_bytes() == whole.to_bytes()


def test_kll_subbatched_estimates_within_guarantee(monkeypatch):
    # KLL state is batch-boundary dependent (compaction points move), so
    # parity is estimates-level, not byte-level: shrinking the sub-batch
    # size must keep rank error within the sketch's epsilon.
    rng = np.random.default_rng(13)
    vals = rng.normal(0.0, 100.0, size=50_000)
    whole = make_sketch("kll", k=200).update(vals)
    monkeypatch.setattr(make_sketch("kll").__class__, "_SUB", 1_000)
    split = make_sketch("kll", k=200).update(vals)
    exact = np.quantile(vals, [0.1, 0.5, 0.9])
    n = float(len(vals))
    for q, ex in zip([0.1, 0.5, 0.9], exact):
        for sk in (whole, split):
            est = sk.quantile(q)
            # rank of the estimate must be within ~1.7/k of q (KLL bound)
            rank = float((vals <= est).mean())
            assert abs(rank - q) <= 1.7 / 200 + 2.0 / n


def test_realccm_weighted_update_is_whole_batch(monkeypatch):
    # Arbitrary float weights are NOT associativity-exact under partial
    # bincount sums, so the weighted path must ignore UPDATE_SUPER entirely:
    # 4000 x 0.1 into one cell sums to a DIFFERENT double when grouped at
    # 777 (verified: 400.00000000002245 vs 399.9999999999993), so bytes
    # would change if the batch were split. Mirrors CountMinSketch's policy.
    vals = np.zeros(4_000, dtype=np.int64)  # all hit the same cell
    w = np.full(4_000, 0.1)
    whole = make_sketch("realccm", l2sz=10, nh=4).update(vals, counts=w)
    monkeypatch.setattr(base_mod, "UPDATE_SUPER", 777)
    split = make_sketch("realccm", l2sz=10, nh=4).update(vals, counts=w)
    assert split.to_bytes() == whole.to_bytes()


def test_realccm_unweighted_is_subbatched_and_exact(monkeypatch):
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 500, size=4_096, dtype=np.int64)
    whole = make_sketch("realccm", l2sz=10, nh=4).update(vals)
    monkeypatch.setattr(base_mod, "UPDATE_SUPER", 777)
    split = make_sketch("realccm", l2sz=10, nh=4).update(vals)
    assert split.to_bytes() == whole.to_bytes()


def test_subbatched_rejects_counts_on_countless_update():
    with pytest.raises(TypeError):
        make_sketch("smh", m=128).update(np.arange(10), np.ones(10))
