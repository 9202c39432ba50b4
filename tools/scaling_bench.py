"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion: run the SAME flagship token-sketch job at two parallelism levels
(local[N] and local[4N]) on the SAME input and report throughput at both
plus efficiency = T_N·N / (T_4N·4N).

No real cluster exists in this sandbox, so parallelism level stands in for
executor count (driver instruction). Each level runs in its own subprocess
so the JVM/session is fresh and levels can't share executor pools.

Usage: python tools/scaling_bench.py [--n 8] [--docs 60000] [--repeat 2]
Prints one JSON line; append the table to BASELINE.md by hand or via --md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sketch_spark.fixtures import ensure_token_table
from sketch_spark.spark.agg import SketchSpec
from sketch_spark.spark.files import build_sketches_from_parquet
from sketch_spark.spark.session import get_spark

cores = {cores}
spark = get_spark(cores=cores, app=f"scaling_c{{cores}}")
tok_dir = ensure_token_table(n_docs={docs})
n_tokens = spark.read.parquet(tok_dir).select(F.sum("n_tok")).first()[0]
specs = [
    SketchSpec("hll", "hll", "tokens", {{"p": 14}}),
    SketchSpec("cms", "cms", "tokens", {{"l2sz": 18, "nh": 4}}),
    SketchSpec("bloom", "bloom", "tokens", {{"l2sz": 24, "nh": 3}}),
    SketchSpec("mh", "minhash", "tokens", {{"k": 1024}}),
]
build_sketches_from_parquet(spark, tok_dir, specs)  # warm-up: workers, page cache
times = []
for _ in range({repeat}):
    t0 = time.perf_counter()
    sk = build_sketches_from_parquet(spark, tok_dir, specs)
    times.append(time.perf_counter() - t0)
assert sk["cms"].total() == n_tokens
best = min(times)
print("RESULT " + json.dumps({{"cores": cores, "sec": best, "n_tokens": int(n_tokens),
                               "tokens_per_sec": n_tokens / best, "times": times}}))
spark.stop()
"""


def run_level(cores: int, docs: int, repeat: int) -> dict:
    code = _CHILD.format(repo=REPO, cores=cores, docs=docs, repeat=repeat)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"level {cores} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small level N (large = 4N)")
    ap.add_argument("--docs", type=int, default=60_000)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    small = run_level(args.n, args.docs, args.repeat)
    large = run_level(4 * args.n, args.docs, args.repeat)
    # efficiency: ideal scaling would cut time 4x; eff = (T_N * N) / (T_4N * 4N)
    eff = (small["sec"] * args.n) / (large["sec"] * 4 * args.n)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_Nx4N",
                "value": round(eff, 3),
                "pass": eff >= 0.8,
                "small": small,
                "large": large,
                "n_small": args.n,
                "n_large": 4 * args.n,
            }
        )
    )


if __name__ == "__main__":
    main()
