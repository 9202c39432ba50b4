"""End-to-end near-dup DEDUP at corpus scale: the full pairs → connected
components → keep-list pipeline (neardup_dedup), not just candidate
generation (tools/lsh_scale_probe.py covers that).

Runs over the deterministic synthetic corpus (every 10th doc an exact
copy of the doc 9 before it ⇒ components are known {i−9, i} pairs, keep
set is EXACTLY the docs with id % 10 != 9 among the copied range) at n/2
and n documents, and reports wall time at both sizes plus the value-exact
keep check — the strongest available sandbox evidence that the resolver's
iterative label-propagation joins stay linear-ish and correct at scale.

Usage: python tools/cc_scale_probe.py [--docs 200000]
Prints one JSON line (recorded in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sketch_spark.fixtures import ensure_text_corpus
from sketch_spark.pipeline.dedup import neardup_dedup
from sketch_spark.spark.session import get_spark

DUP_EVERY = 10


def run(spark, n_docs: int) -> dict:
    docs = spark.read.parquet(ensure_text_corpus(n_docs, dup_every=DUP_EVERY))
    t0 = time.perf_counter()
    keep = neardup_dedup(docs, threshold=0.95)
    kept = [r[0] for r in keep.select("doc_id").collect()]
    wall = time.perf_counter() - t0
    # closed form: copy ids are i ≡ 9 (mod 10) for i ≥ 10; each pairs with
    # i−9 (the smaller id), so exactly the copies are dropped
    expected_drop = {i for i in range(DUP_EVERY, n_docs) if i % DUP_EVERY == DUP_EVERY - 1}
    got = set(kept)
    expected_keep = set(range(n_docs)) - expected_drop
    return {
        "n_docs": n_docs,
        "wall_s": round(wall, 2),
        "n_keep": len(got),
        "keep_exact": bool(got == expected_keep),
        "docs_per_sec": round(n_docs / wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    args = ap.parse_args()
    spark = get_spark(app="cc_scale_probe")
    half = run(spark, args.docs // 2)
    full = run(spark, args.docs)
    out = {
        "metric": "neardup_dedup_scale_probe",
        "half": half,
        "full": full,
        "time_growth_2x_docs": round(full["wall_s"] / max(half["wall_s"], 1e-9), 2),
        "keep_exact_both": bool(half["keep_exact"] and full["keep_exact"]),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
