"""The generic @subbatched wrapper (sketches/base.py) and the bounded
parquet-direct feed: updates bigger than UPDATE_SUPER are processed in
slices with byte-identical results for the split-invariant kinds."""

import numpy as np
import pytest

import sketch_spark.sketches.base as base_mod
from sketch_spark.sketches.base import make_sketch

SPLIT_INVARIANT = (
    ("ws", {}),
    ("smh", {"m": 128}),
    ("realccm", {"l2sz": 10, "nh": 4}),
)


@pytest.mark.parametrize("kind,kw", SPLIT_INVARIANT, ids=[k for k, _ in SPLIT_INVARIANT])
def test_subbatched_update_is_byte_identical(kind, kw, monkeypatch):
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 3_000, size=10_123, dtype=np.int64)
    whole = make_sketch(kind, **kw).update(vals)  # UPDATE_SUPER >> n: one call
    monkeypatch.setattr(base_mod, "UPDATE_SUPER", 1_000)  # 11 inner slices
    split = make_sketch(kind, **kw).update(vals)
    assert split.to_bytes() == whole.to_bytes()


def test_subbatched_slices_weights_with_values(monkeypatch):
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 500, size=4_096, dtype=np.int64)
    w = rng.integers(1, 5, size=4_096).astype(np.float64)
    whole = make_sketch("realccm", l2sz=10, nh=4).update(vals, counts=w)
    monkeypatch.setattr(base_mod, "UPDATE_SUPER", 777)
    split = make_sketch("realccm", l2sz=10, nh=4).update(vals, counts=w)
    assert split.to_bytes() == whole.to_bytes()


def test_subbatched_rejects_counts_on_countless_update():
    with pytest.raises(TypeError):
        make_sketch("smh", m=128).update(np.arange(10), np.ones(10))
