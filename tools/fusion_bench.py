"""Grouped-build head-to-head: one-pass multi-sketch ``sketch_by_key`` vs
Spark's built-in aggregates at the same group-by shape.

The question this answers (BASELINE.md "matches-or-beats built-ins" at
group-by shape): for per-key distinct-token counts + per-key n_tok
quantiles over the XL token table (2M docs / ~612M tokens, 4 source
keys), what does each strategy cost?

  fused_sketch_by_key — OUR path: ONE scan; per-partition per-key
      HLL+KLL partials built in NumPy from Arrow batches; the only
      shuffle moves |keys|x|specs| kilobyte states. Token arrays are
      consumed in-batch — the 612M-element explode never exists.
  builtin_approx      — Spark's own approximate pair:
      explode(tokens) -> groupBy(source).agg(approx_count_distinct)
      (HLL++ JVM-side, partial agg) + groupBy(source).agg(
      percentile_approx(n_tok)). Two jobs; the first materializes the
      612M-row explode through codegen.
  builtin_exact       — explode -> countDistinct per key: the exact
      baseline, shuffles every distinct (source, token) pair.

All three run after a warm-up of the scan path, and each records
bracketing 1-min loadavg so co-tenant noise is visible. One JSON line.

Usage: python tools/fusion_bench.py [--n-docs 2000000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sketch_spark.fixtures import ensure_token_table
from sketch_spark.spark.agg import SketchSpec, sketch_by_key
from sketch_spark.spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_spark(cores=args.cores, app=f"fusion_bench_c{args.cores}")
    tok_dir = ensure_token_table(n_docs=args.n_docs)
    tok = spark.read.parquet(tok_dir)
    n_tokens = int(tok.select(F.sum("n_tok")).first()[0])

    timings: dict[str, float] = {}
    loadavg: dict[str, list[float]] = {}

    def run(name, fn):
        loadavg[name] = [round(os.getloadavg()[0], 2)]
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        loadavg[name].append(round(os.getloadavg()[0], 2))
        return out

    specs = [
        SketchSpec("hll", "hll", "tokens", {"p": 14}),
        SketchSpec("kll", "kll", "n_tok", {"k": 200}),
    ]
    # warm the scan AND the Python-worker (mapInArrow/applyInPandas) path so
    # no strategy pays session first-use costs in its timed window
    tok.select(F.sum("n_tok")).first()
    sketch_by_key(tok.limit(256), "source", specs).collect()
    fused = run(
        "fused_sketch_by_key",
        lambda: sketch_by_key(tok, "source", specs).collect(),
    )

    exploded = tok.select("source", F.explode("tokens").alias("t"))
    def builtin_approx():
        a = (
            exploded.groupBy("source")
            .agg(F.approx_count_distinct("t", rsd=0.01).alias("d"))
            .collect()
        )
        b = (
            tok.groupBy("source")
            .agg(F.percentile_approx("n_tok", [0.5, 0.9, 0.99], 10000).alias("q"))
            .collect()
        )
        return a, b

    approx = run("builtin_approx", builtin_approx)
    exact = run(
        "builtin_exact",
        lambda: exploded.groupBy("source").agg(F.countDistinct("t").alias("d")).collect(),
    )

    # sanity: our per-key HLL agrees with builtin exact within 2%
    from sketch_spark.sketches.base import from_bytes

    ours = {
        r["source"]: from_bytes(bytes(r["state"])).estimate()
        for r in fused
        if r["name"] == "hll"
    }
    exact_d = {r["source"]: r["d"] for r in exact[0:]}
    worst = max(abs(ours[k] - exact_d[k]) / exact_d[k] for k in exact_d)
    print(
        json.dumps(
            {
                "metric": "fusion_grouped_build",
                "value": timings["fused_sketch_by_key"],
                "unit": "sec",
                "queries": timings,
                "loadavg": loadavg,
                "n_docs": args.n_docs,
                "n_tokens": n_tokens,
                "cores": args.cores,
                "hll_worst_rel_err_vs_exact": round(worst, 5),
                "speedup_vs_builtin_approx": round(
                    timings["builtin_approx"] / timings["fused_sketch_by_key"], 2
                ),
                "speedup_vs_builtin_exact": round(
                    timings["builtin_exact"] / timings["fused_sketch_by_key"], 2
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
