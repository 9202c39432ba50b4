"""Property-style merge-law tests across every sketch kind: random k-way
partitionings of one dataset under random merge orders.

This is the Spark-correctness theorem (SURVEY.md §5 item 3): exact-state
sketches (HLL, Bloom, CMS, Count sketch, MinHash, counting MinHash) must be
*byte-identical* between "merge of partition sketches" and "single-pass over
the union" for any partitioning and any merge order; approximation-state
sketches (KLL, t-digest) must keep their published rank-error guarantee.
Reference analog: testsrc/testmhmerge.cpp over random partitionings."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sketch_spark.sketches.base import make_sketch, merge_all

EXACT_KINDS = [
    ("hll", {"p": 10}),
    ("bloom", {"l2sz": 14, "nh": 4}),
    ("cms", {"l2sz": 12, "nh": 4}),
    ("countsketch", {"l2sz": 12, "nh": 5}),
    ("cs4w", {"l2sz": 12, "nh": 5}),
    ("minhash", {"k": 256}),
    ("counting_minhash", {"k": 256}),
    ("multiplicity", {"r": 4}),
    ("bbmh", {"p": 8, "b": 16}),
    ("divbbmh", {"nbuckets": 1000, "b": 16}),
    ("kminhash", {"k": 128}),
    ("smh", {"m": 128}),
    ("dhll", {"p": 10}),
    ("modsketch", {"m": 64}),
    ("hlf", {"p": 8, "l2ss": 2}),
    ("phll", {"p": 10}),
    ("pmh", {"m": 128}),
    ("icws", {"m": 128}),
    ("hmh", {"p": 8, "r": 8}),
]

DATA = np.random.default_rng(2024).integers(0, 2**32, 30_000, dtype=np.int64)


@pytest.mark.parametrize("kind,params", EXACT_KINDS, ids=[k for k, _ in EXACT_KINDS])
@settings(max_examples=12, deadline=None)
@given(
    n_parts=st.integers(min_value=1, max_value=12),
    order_seed=st.integers(min_value=0, max_value=2**31),
)
def test_partition_merge_equals_single_pass(kind, params, n_parts, order_seed):
    single = make_sketch(kind, **params).update(DATA)
    rng = np.random.default_rng(order_seed)
    # random contiguous partitioning
    cuts = np.sort(rng.choice(len(DATA), size=n_parts - 1, replace=False)) if n_parts > 1 else []
    parts = np.split(DATA, cuts)
    sketches = [make_sketch(kind, **params).update(p) for p in parts]
    rng.shuffle(sketches)  # merge order must not matter
    merged = merge_all(sketches)
    assert merged.to_bytes() == single.to_bytes()


@pytest.mark.parametrize("kind,params", EXACT_KINDS, ids=[k for k, _ in EXACT_KINDS])
def test_identity_element(kind, params):
    """Merging an empty sketch is a no-op (the UDAF zero value)."""
    s = make_sketch(kind, **params).update(DATA[:5000])
    empty = make_sketch(kind, **params)
    assert s.copy().merge(empty).to_bytes() == s.to_bytes()
    assert empty.copy().merge(s).to_bytes() == s.to_bytes()


FLOATS = np.random.default_rng(11).lognormal(2.0, 1.0, 200_000)


@pytest.mark.parametrize(
    "kind,params,tol",
    [("kll", {"k": 200}, 4 * 1.7 / 200), ("tdigest", {"delta": 200.0}, 0.025)],
    ids=["kll", "tdigest"],
)
@settings(max_examples=6, deadline=None)
@given(
    n_parts=st.integers(min_value=2, max_value=16),
    order_seed=st.integers(min_value=0, max_value=2**31),
)
def test_quantile_merge_keeps_guarantee(kind, params, tol, n_parts, order_seed):
    rng = np.random.default_rng(order_seed)
    cuts = np.sort(rng.choice(len(FLOATS), size=n_parts - 1, replace=False))
    sketches = [make_sketch(kind, **params).update(p) for p in np.split(FLOATS, cuts)]
    rng.shuffle(sketches)
    merged = merge_all(sketches)
    for q in (0.1, 0.5, 0.9):
        v = float(np.atleast_1d(merged.quantile(q))[0])
        assert abs(float((FLOATS <= v).mean()) - q) <= tol
