"""CSVector (reference rnla.h:35-243): CountSketch vector compression —
linear merge, median-of-rows coordinate recovery, dense-domain top-k,
dot/l2 preservation. The transform is the distributed heavy-coordinate
recovery shape: partials compress locally and ADD."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, make_sketch, merge_all
from sketch_spark.sketches.rnla import CSVector, WZVector

RNG = np.random.default_rng(11)


def test_heavy_coordinate_recovery_exact_topk():
    """Planted heavy coordinates among 100k light ones: top-k recovery
    returns exactly the planted set (top_indices_from_compressed,
    rnla.h:209-243)."""
    olddim = 200_000
    heavy_idx = np.arange(10, dtype=np.int64) * 1111
    heavy_w = np.linspace(5000, 14000, 10)
    sk = CSVector(d_out=8192, ns=5)
    sk.update(heavy_idx, counts=heavy_w)
    sk.update(RNG.integers(0, olddim, 100_000))  # unit-weight noise floor
    vals, idx = sk.top_indices(olddim, 10)
    assert set(idx.tolist()) == set(heavy_idx.tolist())
    # recovered magnitudes near truth (collision noise ~ sqrt(N/d_out))
    order = np.argsort(idx)
    assert np.allclose(np.sort(vals[order]), np.sort(heavy_w), rtol=0.05, atol=30)


def test_decompress_median_beats_single_row():
    """Median over ns rows suppresses collision outliers (cs_decompress,
    rnla.h:176-196)."""
    idx = np.arange(2000, dtype=np.int64)
    w = RNG.random(2000) * 10
    sk = CSVector(d_out=1024, ns=7)
    sk.update(idx, counts=w)
    est = sk.decompress(idx)
    med_err = np.median(np.abs(est - w))
    one_row = CSVector(d_out=1024, ns=1)
    one_row.update(idx, counts=w)
    one_err = np.median(np.abs(one_row.decompress(idx) - w))
    assert med_err <= one_err + 1e-9


def test_linearity_partition_merge():
    """Compressed partials add: partitioned build agrees with single pass
    to float-sum ULP (documented guarantee level); integer weights below
    2^53 are exactly equal."""
    vals = np.arange(3000, dtype=np.int64)
    w_int = RNG.integers(1, 1000, 3000).astype(np.float64)
    single = CSVector(d_out=4096, ns=4)
    single.update(vals, counts=w_int)
    parts = []
    for sl in (slice(0, 1000), slice(1000, 2222), slice(2222, 3000)):
        p = CSVector(d_out=4096, ns=4)
        p.update(vals[sl], counts=w_int[sl])
        parts.append(p)
    RNG.shuffle(parts)
    merged = merge_all(parts)
    # integer weights: exact equality of every bucket
    np.testing.assert_array_equal(merged.table, single.table)


def test_dot_and_l2_preservation():
    idx = np.arange(500, dtype=np.int64)
    xw, yw = RNG.random(500), RNG.random(500)
    sx = CSVector(d_out=2048, ns=5)
    sx.update(idx, counts=xw)
    sy = CSVector(d_out=2048, ns=5)
    sy.update(idx, counts=yw)
    true_dot = float(xw @ yw)
    assert sx.dot(sy) == pytest.approx(true_dot, rel=0.1)
    assert sx.l2() == pytest.approx(float(np.linalg.norm(xw)), rel=0.05)
    assert sx.dot(sx) == pytest.approx(float(xw @ xw), rel=0.05)


def test_signed_updates_and_absolute_topk():
    """Negative weights flow through (the AbsMax recovery variant,
    rnla.h:204-207)."""
    sk = CSVector(d_out=4096, ns=5)
    sk.update(np.array([7, 13], dtype=np.int64), counts=np.array([-500.0, 300.0]))
    vals, idx = sk.top_indices(100, 2, absolute=True)
    assert set(idx.tolist()) == {7, 13}
    assert vals[np.argmax(np.abs(vals))] == pytest.approx(-500.0, abs=1.0)


def test_wz_heavy_recovery_and_determinism():
    """WZ exponential-sampling variant (wz_compress/wz_decompress,
    rnla.h:88-174): planted heavies among unit-weight noise recover by
    top-k, and two independently-built sketches with the same seed are
    byte-identical (multipliers are a pure hash function)."""
    olddim = 200_000
    heavy_idx = np.arange(10, dtype=np.int64) * 1111
    heavy_w = np.linspace(5000, 14000, 10)
    sk = WZVector(d_out=8192, ns=5, p=1.0)
    sk.update(heavy_idx, counts=heavy_w)
    noise = RNG.integers(0, olddim, 100_000)
    sk.update(noise)
    vals, idx = sk.top_indices(olddim, 10)
    assert set(idx.tolist()) == set(heavy_idx.tolist())
    order = np.argsort(idx)
    assert np.allclose(np.sort(vals[order]), np.sort(heavy_w), rtol=0.05, atol=50)
    twin = WZVector(d_out=8192, ns=5, p=1.0)
    twin.update(heavy_idx, counts=heavy_w)
    twin.update(noise)
    assert twin.to_bytes() == sk.to_bytes()


def test_wz_linearity_partition_merge():
    """wz stays LINEAR: compressed partials add. Multipliers are
    irrational, so partitioned vs single-pass agrees to float-sum ULP
    (documented guarantee level — same class as float-weight csvec)."""
    vals = np.arange(3000, dtype=np.int64)
    w_int = RNG.integers(1, 1000, 3000).astype(np.float64)
    single = WZVector(d_out=4096, ns=4)
    single.update(vals, counts=w_int)
    parts = []
    for sl in (slice(0, 1000), slice(1000, 2222), slice(2222, 3000)):
        p = WZVector(d_out=4096, ns=4)
        p.update(vals[sl], counts=w_int[sl])
        parts.append(p)
    RNG.shuffle(parts)
    merged = merge_all(parts)
    assert np.allclose(merged.table, single.table, rtol=1e-12, atol=1e-9)


def test_wz_rate_param_and_unsupported_queries():
    """p scales the multiplier distribution (state differs), recovery
    still holds at p != 1; dot/l2 are rejected (E[mult^2] != 1)."""
    idx = np.arange(200, dtype=np.int64)
    w = RNG.random(200) * 100 + 10
    a = WZVector(d_out=2048, ns=7, p=1.0)
    b = WZVector(d_out=2048, ns=7, p=3.0)
    a.update(idx, counts=w)
    b.update(idx, counts=w)
    assert a.to_bytes() != b.to_bytes()
    assert np.allclose(np.median(np.abs(b.decompress(idx) - w)), 0.0, atol=5.0)
    with pytest.raises(ValueError):
        a.dot(a)
    with pytest.raises(ValueError):
        a.l2()
    with pytest.raises(ValueError):
        WZVector(p=0.0)
    with pytest.raises(ValueError):
        a.merge(WZVector(d_out=2048, ns=7, p=2.0))


def test_wz_roundtrip_factory():
    sk = make_sketch("wzcs", d_out=777, ns=3, p=0.5)
    sk.update(np.arange(100, dtype=np.int64))
    r = from_bytes(sk.to_bytes())
    assert r.to_bytes() == sk.to_bytes()
    assert isinstance(r, WZVector) and r.p == 0.5
    np.testing.assert_array_equal(r.decompress(np.arange(100)), sk.decompress(np.arange(100)))


def test_roundtrip_params_and_factory():
    sk = make_sketch("csvec", d_out=999, ns=3)  # non-power-of-2 d_out
    sk.update(np.arange(100, dtype=np.int64))
    r = from_bytes(sk.to_bytes())
    assert r.to_bytes() == sk.to_bytes()
    assert np.allclose(r.decompress(np.arange(100)), sk.decompress(np.arange(100)))
    with pytest.raises(ValueError):
        CSVector(d_out=1)
    with pytest.raises(ValueError):
        CSVector(d_out=1024, ns=0)
    with pytest.raises(ValueError):
        CSVector(d_out=1024).merge(CSVector(d_out=2048))


# ---------------------------------------------------------------------------
# TensorSketch (Pham & Pagh KDD'13) — the FFT tensor sketch of the
# reference's own TODO (rnla.h:26-31), shipped working.
# ---------------------------------------------------------------------------


def test_tensorsketch_gram_energy_accuracy():
    """<ts(A), ts(B)> estimates the degree-2 Gram energy
    sum_ij <x_i, y_j>^2 = ||X Y^T||_F^2 within the collision-noise
    envelope (deterministic: seeded hashes, fixed data)."""
    rng = np.random.default_rng(3)
    X, Y = rng.normal(size=(40, 64)), rng.normal(size=(30, 64))
    exact = float(((X @ Y.T) ** 2).sum())
    a = make_sketch("tensorsketch", d=64, d_out=4096, degree=2, ns=6).update(X)
    b = make_sketch("tensorsketch", d=64, d_out=4096, degree=2, ns=6).update(Y)
    assert a.dot(b) == pytest.approx(exact, rel=0.05)
    # self energy: ||X X^T||_F^2
    assert a.frobenius_energy() == pytest.approx(float(((X @ X.T) ** 2).sum()), rel=0.05)


def test_tensorsketch_degree1_is_countsketch_dot():
    """degree=1 collapses the convolution: the sketch is one CountSketch
    and dot estimates the plain inner product of the summed vectors."""
    rng = np.random.default_rng(5)
    x, y = rng.normal(size=64), rng.normal(size=64)
    a = make_sketch("tensorsketch", d=64, d_out=2048, degree=1, ns=7).update(x)
    b = make_sketch("tensorsketch", d=64, d_out=2048, degree=1, ns=7).update(y)
    assert a.dot(b) == pytest.approx(float(x @ y), abs=0.15 * 64**0.5)


def test_tensorsketch_degree3_kernel():
    """Cubic kernel: planted strongly-aligned pair dominates, estimate
    tracks sum_ij <x_i,y_j>^3 within envelope."""
    rng = np.random.default_rng(9)
    base = rng.normal(size=64)
    X = np.vstack([base + 0.05 * rng.normal(size=64) for _ in range(5)])
    Y = np.vstack([base + 0.05 * rng.normal(size=64) for _ in range(5)])
    exact = float(((X @ Y.T) ** 3).sum())
    a = make_sketch("tensorsketch", d=64, d_out=8192, degree=3, ns=7).update(X)
    b = make_sketch("tensorsketch", d=64, d_out=8192, degree=3, ns=7).update(Y)
    assert a.dot(b) == pytest.approx(exact, rel=0.1)


def test_tensorsketch_linearity_partition_merge():
    """Any partitioning of the row set merges to the single-pass table up
    to float summation order (ULP) — the distributed contract; weighted
    rows ride through the same identity."""
    rng = np.random.default_rng(7)
    X = rng.normal(size=(48, 32))
    w = rng.uniform(0.5, 2.0, size=48)
    full = make_sketch("tensorsketch", d=32, d_out=1024, degree=2, ns=4).update(X, counts=w)
    parts = [
        make_sketch("tensorsketch", d=32, d_out=1024, degree=2, ns=4).update(
            X[lo:hi], counts=w[lo:hi]
        )
        for lo, hi in ((0, 7), (7, 20), (20, 48))
    ]
    merged = merge_all(parts)
    assert np.allclose(merged.table, full.table, rtol=1e-12, atol=1e-12)
    # weighted exact identity: integer weights, exact bilinear expansion
    wi = np.ones(48)
    fa = make_sketch("tensorsketch", d=32, d_out=4096, degree=2, ns=6, seed=3).update(X, counts=wi)
    exact = float(((X @ X.T) ** 2).sum())
    assert fa.frobenius_energy() == pytest.approx(exact, rel=0.05)


def test_tensorsketch_roundtrip_guards_and_params():
    sk = make_sketch("tensorsketch", d=16, d_out=256, degree=2, ns=3, seed=42)
    sk.update(np.eye(16)[:4])
    rt = from_bytes(sk.to_bytes())
    assert rt.to_bytes() == sk.to_bytes()
    other = make_sketch("tensorsketch", d=16, d_out=256, degree=2, ns=3, seed=43)
    with pytest.raises(ValueError, match="parameter mismatch"):
        sk.merge(other)
    with pytest.raises(ValueError, match="expected"):
        sk.update(np.zeros((2, 17)))
    for bad in (
        {"d": 0}, {"d_out": 1}, {"degree": 0}, {"degree": 9}, {"ns": 0}, {"ns": 17},
    ):
        with pytest.raises(ValueError):
            make_sketch("tensorsketch", **bad)
