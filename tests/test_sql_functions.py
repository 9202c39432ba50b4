"""SQL function surface: sketch states queryable from spark.sql by name,
plus skew-robustness of the grouped build (map-side partial aggregation
means a hot key never creates a hot reducer — the rows that shuffle are
per-(partition, key) states, bounded by partitions × keys)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketch_spark.functions import register_sql_functions
from sketch_spark.spark.agg import SketchSpec, sketch_by_key


@pytest.fixture(scope="module")
def states_view(spark, fixtures):
    d, _ = fixtures
    df = spark.read.parquet(os.path.join(d, "overlap"))
    states = sketch_by_key(
        df,
        "source",
        [
            SketchSpec("h", "hll", "tokens", {"p": 14}),
            SketchSpec("k", "kll", "n_tok", {"k": 200}),
        ],
    )
    states.createOrReplaceTempView("states")
    register_sql_functions(spark)
    return states


def test_sql_estimate_and_kind(spark, fixtures, states_view):
    _, answers = fixtures
    rows = spark.sql(
        "SELECT source, sketch_kind(state) AS kind, sketch_estimate(state) AS est "
        "FROM states WHERE name = 'h' ORDER BY source"
    ).collect()
    assert [r["kind"] for r in rows] == ["hll", "hll"]
    bound = 3 * 1.03896 / np.sqrt(1 << 14)
    for r, key in zip(rows, ("distinct_a", "distinct_b")):
        exact = answers["overlap"][key]
        assert abs(r["est"] - exact) <= bound * exact


def test_sql_quantile(spark, states_view):
    rows = spark.sql(
        "SELECT sketch_quantile(state, 0.5) AS med FROM states WHERE name = 'k'"
    ).collect()
    assert all(r["med"] > 0 for r in rows)


def test_sql_jaccard_and_union(spark, fixtures, states_view):
    _, answers = fixtures
    r = spark.sql(
        """
        SELECT sketch_jaccard(a.state, b.state) AS ji,
               sketch_union_size(a.state, b.state) AS u
        FROM states a JOIN states b
        ON a.name = 'h' AND b.name = 'h' AND a.source = 'A' AND b.source = 'B'
        """
    ).first()
    true_ji = answers["overlap"]["true_jaccard"]
    assert abs(r["ji"] - true_ji) <= 0.05
    assert abs(r["u"] - answers["overlap"]["union"]) / answers["overlap"]["union"] < 0.05


def test_sql_merge_pair_matches_python_merge(spark, states_view):
    from sketch_spark.sketches.base import from_bytes

    r = spark.sql(
        """
        SELECT sketch_merge_pair(a.state, b.state) AS m, a.state AS sa, b.state AS sb
        FROM states a JOIN states b
        ON a.name = 'h' AND b.name = 'h' AND a.source = 'A' AND b.source = 'B'
        """
    ).first()
    want = from_bytes(bytes(r["sa"])).merge(from_bytes(bytes(r["sb"])))
    assert bytes(r["m"]) == want.to_bytes()


# ---------------- skew robustness -------------------------------------------------


def test_grouped_build_correct_under_extreme_key_skew(spark):
    """One key holds 95% of rows; the grouped sketch must still be exact-state
    correct, and the shuffle moves only per-(partition, key) states."""
    import pandas as pd

    n = 200_000
    rng = np.random.default_rng(8)
    keys = np.where(rng.random(n) < 0.95, "hot", rng.choice(["a", "b", "c"], n))
    vals = rng.integers(0, 100_000, n)
    pdf = pd.DataFrame({"k": keys, "v": vals})
    df = spark.createDataFrame(pdf).repartition(16)
    states = sketch_by_key(df, "k", [SketchSpec("h", "hll", "v", {"p": 14})])
    got = {r["k"]: r["state"] for r in states.collect()}
    from sketch_spark.sketches.base import from_bytes, make_sketch

    for key in ("hot", "a", "b", "c"):
        local = make_sketch("hll", p=14).update(vals[keys == key])
        # same registers regardless of which partitions held the hot key
        assert bytes(got[key]) == local.to_bytes(), key
