"""DDSketch (published algorithm — Masson et al. VLDB 2019; the reference's
dd.h:32-194 throws before answering a quantile): relative-error guarantee
at every q, full-real-line stores, bin-wise byte-identical merges, bounded
memory via the collapsing store."""

import numpy as np
import pytest

from sketch_spark.sketches.base import from_bytes, merge_all
from sketch_spark.sketches.dd import DDSketch


def test_relative_error_guarantee_lognormal():
    rng = np.random.default_rng(0)
    v = rng.lognormal(2, 1.5, 200_000)
    sk = DDSketch(alpha=0.01).update(v)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est, true = sk.quantile(q), float(np.quantile(v, q))
        # α on the bucket + nearest-rank vs interpolation slack
        assert abs(est - true) <= 2 * 0.01 * true + 1e-9, (q, est, true)


def test_mixed_signs_and_zeros():
    v = np.concatenate([np.full(100, -50.0), np.zeros(100), np.full(100, 50.0)])
    sk = DDSketch(alpha=0.01).update(v)
    assert sk.quantile(0.5) == 0.0
    assert abs(sk.quantile(0.05) + 50.0) <= 0.01 * 50 + 1e-9
    assert abs(sk.quantile(0.95) - 50.0) <= 0.01 * 50 + 1e-9
    assert sk.total() == 300


def test_merge_byte_identical_any_partitioning():
    rng = np.random.default_rng(1)
    v = rng.lognormal(0, 2, 60_000) * np.sign(rng.standard_normal(60_000))
    one = DDSketch(alpha=0.02).update(v)
    for n_parts in (2, 5, 9):
        parts = [DDSketch(alpha=0.02).update(c) for c in np.array_split(v, n_parts)]
        rng.shuffle(parts)
        assert merge_all(parts).to_bytes() == one.to_bytes()
    assert from_bytes(one.to_bytes()).to_bytes() == one.to_bytes()


def test_collapse_bounds_memory_and_keeps_upper_quantiles():
    """A store spanning more than maxbins buckets folds its lowest buckets;
    quantiles ABOVE the collapsed region keep the α guarantee (paper §2.3)."""
    rng = np.random.default_rng(2)
    # 10^12 dynamic range at alpha=0.05 → ~270 buckets; maxbins=64 forces collapse
    v = np.exp(rng.uniform(0, 27.6, 100_000))
    sk = DDSketch(alpha=0.05, maxbins=64).update(v)
    assert len(sk.pos_keys) <= 64
    for q in (0.9, 0.99):
        est, true = sk.quantile(q), float(np.quantile(v, q))
        assert abs(est - true) <= 2 * 0.05 * true, (q, est, true)


def test_param_mismatch_and_empty():
    sk = DDSketch(alpha=0.01)
    assert np.isnan(sk.quantile(0.5))
    with pytest.raises(ValueError):
        sk.merge(DDSketch(alpha=0.02))


def test_spark_build(spark):
    from sketch_spark.spark.agg import SketchSpec, build_sketches

    rng = np.random.default_rng(3)
    vals = rng.lognormal(1, 1, 20_000)
    df = spark.createDataFrame([(float(x),) for x in vals], "x double").repartition(8)
    sk = build_sketches(df, [SketchSpec("d", "ddsketch", "x", {"alpha": 0.01})])["d"]
    want = DDSketch(alpha=0.01).update(vals)
    # bin-add merges are exact → distributed == local bytes
    assert sk.to_bytes() == want.to_bytes()
