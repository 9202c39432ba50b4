"""HyperLogLog: register exactness vs a scalar oracle, published error
bounds, merge laws, compress, similarity operators.

Reference analogs: testsrc/hlltest.cpp:22-80 (error bounds over inserts of
0..n), hll.h:801-814 (insert semantics), hll.h:934-968 (max merge),
testsrc/testcontain.cpp (containment identities)."""

import numpy as np
import pytest

from sketch_spark.hashing import hash_tokens, wanghash_scalar
from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.hll import HyperLogLog, _register_updates

RNG = np.random.default_rng(42)


def _scalar_register_oracle(hashed: np.ndarray, p: int) -> np.ndarray:
    """20-line scalar port of the insert rule: idx = hv >> (64-p), rank =
    1 + (# leading zeros of the low 64-p bits read as a (64-p)-bit window)."""
    q = 64 - p
    regs = np.zeros(1 << p, dtype=np.uint8)
    for hv in hashed:
        hv = int(hv)
        idx = hv >> q
        w = hv & ((1 << q) - 1)
        # leading zeros within the q-bit window
        lz = q - w.bit_length()
        rank = min(lz, q) + 1
        regs[idx] = max(regs[idx], rank)
    return regs


def test_registers_bit_exact_vs_scalar_oracle():
    hashed = RNG.integers(0, 2**64, 5000, dtype=np.uint64)
    for p in (6, 10, 14):
        h = HyperLogLog(p=p).update_hashed(hashed)
        np.testing.assert_array_equal(h.regs, _scalar_register_oracle(hashed, p))


def test_register_rank_range():
    hashed = RNG.integers(0, 2**64, 10_000, dtype=np.uint64)
    idx, rank = _register_updates(hashed, 14)
    assert rank.min() >= 1 and rank.max() <= (64 - 14) + 1
    assert idx.min() >= 0 and idx.max() < (1 << 14)


@pytest.mark.parametrize("n", [1_000, 10_000, 100_000, 1_000_000])
def test_error_bound_vs_exact(n):
    """hlltest.cpp pattern: insert distinct 0..n, estimate within the
    published envelope (3σ of 1.03896/√m; deterministic seed so stable)."""
    h = HyperLogLog(p=14)
    h.update(np.arange(n, dtype=np.int64))
    est = h.estimate()
    assert abs(est - n) <= 3.0 * h.relative_error() * n
    # reference asserts est_err() covers the true error (1σ claim); allow 3σ
    assert abs(est - n) <= 3.0 * h.est_err()


def test_original_estimator_also_within_bound():
    n = 50_000
    h = HyperLogLog(p=14, estimator="original")
    h.update(np.arange(n, dtype=np.int64))
    assert abs(h.estimate() - n) <= 3.0 * h.relative_error() * n


def test_small_range_exactish():
    h = HyperLogLog(p=14)
    h.update(np.arange(100, dtype=np.int64))
    assert abs(h.estimate() - 100) <= 5


def test_empty_estimate_zero():
    assert HyperLogLog(p=12).estimate() == pytest.approx(0.0, abs=1e-9)


def test_merge_equals_single_pass_byte_identical():
    """The Spark-correctness theorem: partition sketches merged == one-pass
    sketch of the union (registers are a max-monoid → byte-identical)."""
    data = RNG.integers(0, 2**40, 200_000, dtype=np.int64)
    single = HyperLogLog(p=12).update(data)
    parts = np.array_split(data, 13)
    merged = merge_all(HyperLogLog(p=12).update(part) for part in parts)
    np.testing.assert_array_equal(merged.regs, single.regs)
    assert merged.to_bytes() == single.to_bytes()


def test_merge_associative_and_commutative():
    chunks = [RNG.integers(0, 2**40, 10_000, dtype=np.int64) for _ in range(3)]
    a, b, c = (HyperLogLog(p=10).update(ch) for ch in chunks)
    ab_c = a.copy().merge(b).merge(c)
    a_bc = a.copy().merge(b.copy().merge(c))
    ba = b.copy().merge(a)
    assert ab_c.to_bytes() == a_bc.to_bytes()
    assert a.copy().merge(b).to_bytes() == ba.to_bytes()


def test_merge_parameter_mismatch_raises():
    with pytest.raises(ValueError):
        HyperLogLog(p=10).merge(HyperLogLog(p=12))
    with pytest.raises(ValueError):
        HyperLogLog(p=10, seed=1).merge(HyperLogLog(p=10, seed=2))


def test_union_jaccard_containment_on_known_overlap():
    """True JI = 1/3 construction (A=[0,20k), B=[10k,30k)) — the reference's
    acc.cpp benchmark geometry."""
    a = HyperLogLog(p=14).update(np.arange(0, 20_000, dtype=np.int64))
    b = HyperLogLog(p=14).update(np.arange(10_000, 30_000, dtype=np.int64))
    assert abs(a.union_size(b) - 30_000) <= 3 * a.relative_error() * 30_000
    assert abs(a.jaccard_index(b) - 1.0 / 3.0) <= 0.05
    # containment |A∩B|/|A| = 0.5
    assert abs(a.containment_index(b) - 0.5) <= 0.07
    # self-containment == 1 (testcontain.cpp:35)
    assert a.containment_index(a) == pytest.approx(1.0, abs=1e-9)


def test_compress_register_exact_vs_direct_build():
    """Ertl Alg.3 fold p→p' must equal building at p' directly (exact
    register identity, hll.h:877-896)."""
    hashed = RNG.integers(0, 2**64, 50_000, dtype=np.uint64)
    big = HyperLogLog(p=14).update_hashed(hashed)
    small_direct = HyperLogLog(p=10).update_hashed(hashed)
    np.testing.assert_array_equal(big.compress(10).regs, small_direct.regs)


def test_compress_enables_cross_p_merge():
    x = np.arange(10_000, dtype=np.int64)
    y = np.arange(5_000, 15_000, dtype=np.int64)
    h14 = HyperLogLog(p=14).update(x)
    h10 = HyperLogLog(p=10).update(y)
    merged = h14.compress(10).merge(h10)
    assert abs(merged.estimate() - 15_000) <= 3 * merged.relative_error() * 15_000


def test_may_contain_no_false_negatives():
    vals = RNG.integers(0, 2**40, 5_000, dtype=np.int64)
    h = HyperLogLog(p=14).update(vals)
    assert h.may_contain(vals).all()


def test_serialization_round_trip_and_resume():
    h = HyperLogLog(p=12).update(np.arange(10_000, dtype=np.int64))
    h2 = from_bytes(h.to_bytes())
    assert h2.to_bytes() == h.to_bytes()
    # updating the restored sketch matches updating the original
    more = np.arange(10_000, 20_000, dtype=np.int64)
    assert h2.update(more).to_bytes() == h.update(more).to_bytes()


@pytest.mark.parametrize("n", [1_000, 10_000, 100_000, 1_000_000])
def test_mle_estimator_within_bound(n):
    """hlltest.cpp:77 parity: the ERTL_MLE estimator also stays inside the
    published envelope on deterministic inserts of 0..n."""
    h = HyperLogLog(p=14, estimator="mle")
    h.update(np.arange(n, dtype=np.int64))
    assert abs(h.estimate() - n) <= 3.0 * h.relative_error() * n


def test_mle_estimator_edge_cases():
    assert HyperLogLog(p=10, estimator="mle").estimate() == 0.0
    h = HyperLogLog(p=10, estimator="mle").update(np.arange(3, dtype=np.int64))
    assert 1 <= h.estimate() <= 6


def test_three_estimators_agree_at_scale():
    n = 200_000
    data = np.arange(n, dtype=np.int64)
    ests = {
        e: HyperLogLog(p=14, estimator=e).update(data).estimate()
        for e in ("ertl", "original", "mle")
    }
    for e, v in ests.items():
        assert abs(v - n) / n < 0.03, (e, v)


def test_ertl_joint_mle_decomposition():
    """Joint MLE (|A\\B|, |B\\A|, |A∩B|) on the JI=1/3 geometry — tighter
    than inclusion-exclusion (reference hll.h:601-649)."""
    a = HyperLogLog(p=14).update(np.arange(0, 20_000, dtype=np.int64))
    b = HyperLogLog(p=14).update(np.arange(10_000, 30_000, dtype=np.int64))
    a_only, b_only, inter = a.joint_estimate(b)
    assert abs(a_only - 10_000) / 10_000 < 0.05
    assert abs(b_only - 10_000) / 10_000 < 0.05
    assert abs(inter - 10_000) / 10_000 < 0.05
    # small-intersection case where inclusion-exclusion is noisy
    c = HyperLogLog(p=14).update(np.arange(19_000, 39_000, dtype=np.int64))
    _, _, small_inter = a.joint_estimate(c)
    assert abs(small_inter - 1_000) / 1_000 < 0.35
    assert a.intersection_size(c, joint=True) == pytest.approx(small_inter)
def test_joint_requires_equal_p():
    with pytest.raises(ValueError):
        HyperLogLog(p=10).joint_estimate(HyperLogLog(p=12))


def test_sparse_wire_encoding_round_trips():
    """Low-fill states ship as (idx<<6|val) pairs (sparse.h:16-28 layout);
    restore must be register-exact and merge-compatible with dense states."""
    small = HyperLogLog(p=14).update(np.arange(50, dtype=np.int64))
    blob = small.to_bytes()
    assert len(blob) < 1000  # dense would be 16KB+
    back = from_bytes(blob)
    np.testing.assert_array_equal(back.regs, small.regs)
    big = HyperLogLog(p=14).update(np.arange(100_000, dtype=np.int64))
    merged = back.copy().merge(big)
    direct = HyperLogLog(p=14).update(np.arange(50, dtype=np.int64)).merge(
        HyperLogLog(p=14).update(np.arange(100_000, dtype=np.int64))
    )
    assert merged.to_bytes() == direct.to_bytes()


# ---------------- bidirectional HLL (reference dhll, hll.h:1326-1365) --------


def test_dhll_estimate_within_bound():
    from sketch_spark.sketches.hll import DoubleHLL

    for n in (1000, 100_000, 1_000_000):
        d = DoubleHLL(p=12).update(np.arange(n, dtype=np.int64))
        assert abs(d.estimate() - n) <= 3 * d.relative_error() * n


def test_dhll_merge_byte_identical_and_roundtrip():
    from sketch_spark.sketches.base import from_bytes, merge_all
    from sketch_spark.sketches.hll import DoubleHLL

    rng = np.random.default_rng(1)
    data = rng.integers(0, 2**40, 50_000, dtype=np.int64)
    single = DoubleHLL(p=10).update(data)
    merged = merge_all(DoubleHLL(p=10).update(c) for c in np.array_split(data, 7))
    assert merged.to_bytes() == single.to_bytes()
    assert from_bytes(single.to_bytes()).to_bytes() == single.to_bytes()


def test_dhll_may_contain_no_false_negatives():
    from sketch_spark.sketches.hll import DoubleHLL

    rng = np.random.default_rng(2)
    data = rng.integers(0, 2**40, 20_000, dtype=np.int64)
    d = DoubleHLL(p=12).update(data)
    assert bool(d.may_contain(data).all())


# ---------------- seeded-HLL ensemble (reference hlf_t, hll.h:1369-1616) -----


def test_hlf_three_estimators_within_bound():
    from sketch_spark.sketches.hll import HyperLogFilter

    rng = np.random.default_rng(5)
    data = rng.integers(0, 2**40, 40_000, dtype=np.int64)
    n = len(np.unique(data))
    sk = HyperLogFilter(p=12, l2ss=3).update(data)
    per_sub = 3 * 1.03896 / np.sqrt(1 << 12)
    assert abs(sk.estimate() - n) <= per_sub * n        # mean can't beat a sub
    assert abs(sk.med_report() - n) <= per_sub * n
    # chunk_report pools ns*m registers: tighter bound
    assert abs(sk.chunk_report() - n) <= 3 * sk.relative_error() * n + 1


def test_hlf_may_contain_no_false_negatives_and_fp_decays():
    """Membership: inserted elements are ALWAYS possibly-present (max-monoid
    registers ≥ every inserted rank — deterministic); the AND over ns seeded
    sub-filters drives false positives down as the ensemble grows."""
    from sketch_spark.sketches.hll import HyperLogFilter

    rng = np.random.default_rng(6)
    data = rng.integers(0, 2**40, 2_000, dtype=np.int64)
    probes = rng.integers(2**41, 2**42, 20_000, dtype=np.int64)
    fp = {}
    for l2ss in (0, 2, 3):
        sk = HyperLogFilter(p=12, l2ss=l2ss).update(data)
        assert bool(sk.may_contain(data).all())
        fp[l2ss] = sk.may_contain(probes).mean()
    assert fp[3] < fp[2] < fp[0]


def test_hlf_merge_byte_identical_and_roundtrip():
    from sketch_spark.sketches.base import from_bytes, merge_all
    from sketch_spark.sketches.hll import HyperLogFilter

    rng = np.random.default_rng(7)
    data = rng.integers(0, 2**40, 30_000, dtype=np.int64)
    single = HyperLogFilter(p=10, l2ss=2).update(data)
    merged = merge_all(HyperLogFilter(p=10, l2ss=2).update(c) for c in np.array_split(data, 5))
    assert merged.to_bytes() == single.to_bytes()
    assert from_bytes(single.to_bytes()).to_bytes() == single.to_bytes()


def test_hlf_jaccard_inclusion_exclusion():
    from sketch_spark.sketches.hll import HyperLogFilter

    a = HyperLogFilter(p=12, l2ss=3).update(np.arange(30_000, dtype=np.int64))
    b = HyperLogFilter(p=12, l2ss=3).update(np.arange(15_000, 45_000, dtype=np.int64))
    assert abs(a.jaccard_index(b) - 1 / 3) <= 0.05


def test_hlf_param_mismatch_raises():
    from sketch_spark.sketches.hll import HyperLogFilter

    with pytest.raises(ValueError):
        HyperLogFilter(p=10, l2ss=2).merge(HyperLogFilter(p=10, l2ss=3))
