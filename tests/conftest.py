"""Shared fixtures: one SparkSession per test session + deterministic
token-table fixtures (FIXTURES.md F1a-F1e) cached under .fixtures_cache/."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES_DIR = os.path.join(REPO, ".fixtures_cache", "tokens")


@pytest.fixture(scope="session")
def spark():
    from sketch_spark.spark.session import get_spark

    s = get_spark(
        cores=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
        app="sketch_spark_tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixtures():
    """(dir, answers) for the token-table fixture variants."""
    from sketch_spark.fixtures import ensure_fixtures

    answers = ensure_fixtures(FIXTURES_DIR, n_docs=10_000, seed=42)
    return FIXTURES_DIR, answers


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
