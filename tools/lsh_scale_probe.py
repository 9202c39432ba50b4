"""LSH near-dup dedup at corpus scale: throughput + candidate-growth probe.

Runs the full signatures → banded-bucket-join → verify pipeline over the
deterministic synthetic text corpus (sketch_spark.fixtures.ensure_text_corpus:
5k-word docs, every 10th an exact copy → planted dup pairs known in closed
form) at n and n/2 documents, and reports:

  * per-phase wall times (sign / candidates / verify) at both sizes,
  * candidate-pair counts at both sizes — with the hot-bucket star guard the
    growth must be ~linear in n, not quadratic,
  * planted-dup recall at est_jaccard = 1.0 (must be 100%: identical text ⇒
    identical signature ⇒ same bucket in every band).

Usage: python tools/lsh_scale_probe.py [--docs 100000]
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
from sketch_spark.pipeline.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    signature_jaccard,
)
from sketch_spark.spark.session import get_spark

DUP_EVERY = 10


def run(spark, n_docs: int) -> dict:
    docs = spark.read.parquet(ensure_text_corpus(n_docs, dup_every=DUP_EVERY))
    t0 = time.perf_counter()
    sigs = minhash_signatures(docs, num_hashes=64).persist()
    sigs.count()
    t1 = time.perf_counter()
    pairs = lsh_candidate_pairs(sigs, bands=8, rows_per_band=8).persist()
    n_pairs = pairs.count()
    t2 = time.perf_counter()
    exact = signature_jaccard(sigs, pairs).where(F.col("est_jaccard") >= 1.0)
    found = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    t3 = time.perf_counter()
    planted = [
        (i - DUP_EVERY + 1, i)
        for i in range(DUP_EVERY, n_docs)
        if i % DUP_EVERY == DUP_EVERY - 1
    ]
    recall = sum((a, b) in found for a, b in planted) / max(len(planted), 1)
    sigs.unpersist()
    pairs.unpersist()
    return {
        "n_docs": n_docs,
        "sign_s": round(t1 - t0, 2),
        "candidates_s": round(t2 - t1, 2),
        "verify_s": round(t3 - t2, 2),
        "candidate_pairs": int(n_pairs),
        "planted_pairs": len(planted),
        "planted_recall": round(recall, 4),
        "docs_per_sec": round(n_docs / (t3 - t0), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    args = ap.parse_args()
    spark = get_spark(app="lsh_scale_probe")
    half = run(spark, args.docs // 2)
    full = run(spark, args.docs)
    growth = full["candidate_pairs"] / max(half["candidate_pairs"], 1)
    out = {
        "metric": "lsh_dedup_scale_probe",
        "half": half,
        "full": full,
        "candidate_growth_2x_docs": round(growth, 2),
        "linear_growth_ok": bool(growth < 3.0),  # 2× docs → ~2× pairs, not 4×
        "recall_ok": bool(full["planted_recall"] == 1.0 and half["planted_recall"] == 1.0),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
