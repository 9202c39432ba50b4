"""KLL + t-digest: rank-error vs exact quantiles, distributed-merge bounds,
determinism, weight conservation.

No working reference implementation exists (DDSketch is unfinished —
/root/reference/include/sketch/dd.h:137 throws), so correctness rests on
the published guarantees: KLL rank error ≈ 1.7/k (Karnin-Lang-Liberty),
t-digest tail-accurate quantiles (Dunning & Ertl)."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.kll import KLL
from sketch_spark.sketches.tdigest import TDigest

RNG = np.random.default_rng(5)
QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]

LOGNORMAL = RNG.lognormal(3.0, 1.0, 500_000)
UNIFORM = RNG.uniform(0, 1, 200_000)
BIMODAL = np.concatenate([RNG.normal(-10, 1, 100_000), RNG.normal(10, 1, 100_000)])


def _true_rank(data: np.ndarray, v: float) -> float:
    return float((data <= v).mean())


@pytest.mark.parametrize("data", [LOGNORMAL, UNIFORM, BIMODAL], ids=["lognormal", "uniform", "bimodal"])
def test_kll_rank_error_single_pass(data):
    sk = KLL(k=200).update(data)
    for q in QS:
        v = sk.quantile(q)
        assert abs(_true_rank(data, v) - q) <= 3 * sk.epsilon()


def test_kll_rank_method_consistency():
    sk = KLL(k=200).update(UNIFORM)
    for q in QS:
        v = sk.quantile(q)
        assert abs(sk.rank(v) - _true_rank(UNIFORM, v)) <= 2 * sk.epsilon()


def test_kll_merge_rank_error_holds():
    """The distributed path: 16 partition sketches merged must keep the bound."""
    parts = np.array_split(LOGNORMAL, 16)
    merged = merge_all(KLL(k=200).update(p) for p in parts)
    assert merged.n == len(LOGNORMAL)
    for q in QS:
        v = merged.quantile(q)
        assert abs(_true_rank(LOGNORMAL, v) - q) <= 4 * merged.epsilon()


def test_kll_deterministic_same_order():
    a = KLL(k=128).update(UNIFORM)
    b = KLL(k=128).update(UNIFORM)
    assert a.to_bytes() == b.to_bytes()
    parts = np.array_split(UNIFORM, 5)
    m1 = merge_all(KLL(k=128).update(p) for p in parts)
    m2 = merge_all(KLL(k=128).update(p) for p in parts)
    assert m1.to_bytes() == m2.to_bytes()


def test_kll_weight_conservation():
    sk = KLL(k=64).update(LOGNORMAL[:100_000])
    _, wt = sk._items_weights()
    assert int(wt.sum()) == 100_000 == sk.n


def test_kll_handles_nan_and_empty():
    sk = KLL(k=64)
    sk.update(np.array([np.nan, np.nan]))
    assert sk.n == 0 and np.isnan(sk.quantile(0.5))
    sk.update(np.array([1.0, np.nan, 3.0]))
    assert sk.n == 2


def test_kll_extremes():
    sk = KLL(k=200).update(UNIFORM)
    assert sk.quantile(0.0) <= np.quantile(UNIFORM, 0.001)
    assert sk.quantile(1.0) >= np.quantile(UNIFORM, 0.999)


def test_kll_cdf_monotone():
    sk = KLL(k=200).update(LOGNORMAL)
    pts = np.quantile(LOGNORMAL, QS)
    cdf = sk.cdf(pts)
    assert (np.diff(cdf) >= 0).all()


def test_kll_serialization_round_trip_and_resume():
    sk = KLL(k=128).update(LOGNORMAL[:50_000])
    back = from_bytes(sk.to_bytes())
    assert back.to_bytes() == sk.to_bytes()
    more = LOGNORMAL[50_000:100_000]
    assert back.update(more).to_bytes() == sk.update(more).to_bytes()


# ---------------- t-digest ----------------------------------------------------


@pytest.mark.parametrize("data", [LOGNORMAL, UNIFORM, BIMODAL], ids=["lognormal", "uniform", "bimodal"])
def test_tdigest_rank_error_single_pass(data):
    td = TDigest(delta=200.0).update(data)
    for q in QS:
        v = float(td.quantile(q))
        assert abs(_true_rank(data, v) - q) <= 0.02


def test_tdigest_tail_accuracy_beats_midrange():
    """The t-digest design goal: k1 scale function concentrates accuracy in
    the tails (q→0, q→1)."""
    td = TDigest(delta=200.0).update(LOGNORMAL)
    for q in (0.001, 0.999):
        v = float(td.quantile(q))
        assert abs(_true_rank(LOGNORMAL, v) - q) <= 0.003


def test_tdigest_centroid_count_bounded():
    td = TDigest(delta=200.0).update(LOGNORMAL)
    assert len(td.means) <= 2 * 200  # ~δ centroids by the size invariant


def test_tdigest_merge_rank_error_holds():
    parts = np.array_split(LOGNORMAL, 16)
    merged = merge_all(TDigest(delta=200.0).update(p) for p in parts)
    assert merged.n == pytest.approx(len(LOGNORMAL))
    for q in QS:
        v = float(merged.quantile(q))
        assert abs(_true_rank(LOGNORMAL, v) - q) <= 0.025


def test_tdigest_min_max_exact():
    td = TDigest(delta=100.0).update(UNIFORM)
    assert td.quantile(0.0) == pytest.approx(UNIFORM.min())
    assert td.quantile(1.0) == pytest.approx(UNIFORM.max())


def test_tdigest_weight_conservation_through_merge():
    parts = np.array_split(UNIFORM, 8)
    merged = merge_all(TDigest(delta=100.0).update(p) for p in parts)
    assert merged.weights.sum() == pytest.approx(len(UNIFORM))


def test_tdigest_deterministic():
    a = TDigest(delta=150.0).update(BIMODAL)
    b = TDigest(delta=150.0).update(BIMODAL)
    assert a.to_bytes() == b.to_bytes()


def test_tdigest_serialization_round_trip():
    td = TDigest(delta=100.0).update(LOGNORMAL[:10_000])
    assert from_bytes(td.to_bytes()).to_bytes() == td.to_bytes()


def test_tdigest_rank_monotone():
    td = TDigest(delta=200.0).update(BIMODAL)
    pts = np.linspace(BIMODAL.min(), BIMODAL.max(), 50)
    r = np.asarray(td.rank(pts))
    assert (np.diff(r) >= -1e-12).all()
