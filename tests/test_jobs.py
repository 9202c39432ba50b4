"""End-to-end smoke tests for the spark-submit entry points (jobs/).

The library paths are gate-tested; these tests exercise the actual CLI
surface the way a user would run it — ``spark-submit --py-files
dist/sketch_spark.zip jobs/<job>.py ...`` in a fresh JVM subprocess —
and assert the outputs match in-process direct builds byte-for-byte
(the §5 merge/partitioning invariant: any partitioning ∘ any merge
order == single-pass bytes for hll).

Kept deliberately lean: each spark-submit run pays ~20 s of JVM startup,
so we cover the four distinct job modes (global build, grouped build,
--rollup, dedup exact) once each on small inputs.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)


@pytest.fixture(scope="module")
def pyfiles_zip():
    """Build dist/sketch_spark.zip fresh so the subprocess ships HEAD code."""
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        check=True,
        capture_output=True,
        cwd=REPO,
    )
    path = os.path.join(REPO, "dist", "sketch_spark.zip")
    assert os.path.exists(path)
    return path


def _run_job(zip_path: str, script: str, args: list[str]) -> dict:
    """spark-submit a job in a fresh JVM; return its final JSON report line."""
    cmd = [
        SPARK_SUBMIT,
        "--master",
        "local[4]",
        "--conf",
        "spark.sql.shuffle.partitions=4",
        "--conf",
        "spark.ui.enabled=false",
        "--py-files",
        zip_path,
        os.path.join(REPO, "jobs", script),
        *args,
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=600, cwd=REPO)
    assert res.returncode == 0, f"{script} failed:\n{res.stderr[-4000:]}"
    json_lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    assert json_lines, f"no JSON report on stdout:\n{res.stdout[-2000:]}"
    return json.loads(json_lines[-1])


def _load_states(spark, path):
    rows = spark.read.parquet(path).collect()
    return rows


def test_build_job_global_matches_direct_build(spark, fixtures, pyfiles_zip, tmp_path):
    fdir, _ = fixtures
    inp = os.path.join(fdir, "uniform")
    out = str(tmp_path / "global_states")

    report = _run_job(
        pyfiles_zip,
        "build_sketches_job.py",
        ["--input", inp, "--col", "tokens", "--sketch", "hll:p=12", "--output", out],
    )
    assert report["mode"] == "global"
    assert report["sketches"]["hll_tokens"]["estimate"] > 0

    # the written state must load and be byte-identical to a direct in-process build
    from sketch_spark.sketches import from_bytes
    from sketch_spark.spark.agg import SketchSpec
    from sketch_spark.spark.files import build_sketches_from_parquet

    rows = _load_states(spark, out)
    assert [r["name"] for r in rows] == ["hll_tokens"]
    job_state = bytes(rows[0]["state"])

    direct = build_sketches_from_parquet(
        spark, inp, [SketchSpec("hll_tokens", "hll", "tokens", {"p": 12})]
    )["hll_tokens"]
    assert job_state == direct.to_bytes()
    assert from_bytes(job_state).estimate() == pytest.approx(direct.estimate())


def test_build_job_grouped_then_rollup_matches_direct(spark, fixtures, pyfiles_zip, tmp_path):
    fdir, _ = fixtures
    inp = os.path.join(fdir, "uniform")
    grouped_out = str(tmp_path / "by_source")
    rolled_out = str(tmp_path / "global_rollup")

    rep1 = _run_job(
        pyfiles_zip,
        "build_sketches_job.py",
        [
            "--input",
            inp,
            "--col",
            "tokens",
            "--group-by",
            "source",
            "--sketch",
            "hll:p=12",
            "--output",
            grouped_out,
        ],
    )
    assert rep1["mode"] == "grouped" and rep1["states"] > 0

    # grouped states must each match a direct per-key build (byte-identical)
    from sketch_spark.spark.agg import SketchSpec, sketch_by_key

    spec = SketchSpec("hll_tokens", "hll", "tokens", {"p": 12})
    direct = {
        r["source"]: bytes(r["state"])
        for r in sketch_by_key(spark.read.parquet(inp), "source", [spec]).collect()
    }
    job_states = {r["source"]: bytes(r["state"]) for r in _load_states(spark, grouped_out)}
    assert job_states == direct

    # --rollup '' = global merge; byte-identical to a direct global build
    rep2 = _run_job(
        pyfiles_zip,
        "build_sketches_job.py",
        ["--input", grouped_out, "--rollup", "", "--output", rolled_out],
    )
    assert rep2["mode"] == "rollup" and rep2["states"] == 1

    from sketch_spark.spark.files import build_sketches_from_parquet

    rolled = bytes(_load_states(spark, rolled_out)[0]["state"])
    global_direct = build_sketches_from_parquet(spark, inp, [spec])["hll_tokens"]
    assert rolled == global_direct.to_bytes()


def test_dedup_job_exact_matches_library(spark, pyfiles_zip, tmp_path):
    inp = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "docs_dedup")

    report = _run_job(
        pyfiles_zip,
        "dedup_job.py",
        ["--input", inp, "--mode", "exact", "--output", out],
    )
    from sketch_spark.pipeline.dedup import exact_dedup

    docs = spark.read.parquet(inp)
    expect = exact_dedup(docs, text_col="text", id_col="doc_id")
    assert report["n_input"] == docs.count()
    assert report["n_output"] == expect.count()
    # the written keep-list is the same id set
    got_ids = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    want_ids = {r["doc_id"] for r in expect.select("doc_id").collect()}
    assert got_ids == want_ids
