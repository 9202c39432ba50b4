"""Production entry point: distributed sketch build via spark-submit.

    # package the library once
    python tools/make_pyfiles.py            # -> dist/sketch_spark.zip

    # whole-table build, parquet-direct scan, checkpointed + resumable
    spark-submit --py-files dist/sketch_spark.zip jobs/build_sketches_job.py \
        --input /data/tokens --col tokens \
        --sketch hll:p=14 --sketch cms:l2sz=20:nh=4 --sketch kll:k=200:col=n_tok \
        --checkpoint /data/ckpt/run1 --output /data/out/run1

    # grouped build (one state per source; comma-separate for composite keys)
    spark-submit --py-files dist/sketch_spark.zip jobs/build_sketches_job.py \
        --input /data/tokens --col tokens --group-by source,day \
        --sketch hll:p=14 --output /data/out/by_source_day

    # OLAP rollup: merge an existing grouped-states table to coarser keys
    # (byte-identical to a direct build at that granularity — no rescan)
    spark-submit --py-files dist/sketch_spark.zip jobs/build_sketches_job.py \
        --input /data/out/by_source_day --rollup source --output /data/out/by_source

The job is the Spark-native restatement of the reference's Cal-DisKS MPI
driver (/root/reference/testsrc/caldiskstest.cpp + mpiParallelIO.cpp):
chunked parallel scan → per-partition sketch → tree merge → estimates,
with per-file lineage checkpointing so a killed job resumes exactly
(sketch updates are deterministic). Skew note: the ungrouped path has no
skew exposure (every partition produces one fixed-size state); the grouped
path pre-aggregates per partition before its single state shuffle, so a hot
key costs map-side CPU, never a hot reducer.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def parse_sketch(arg: str, default_col: str):
    """'hll:p=14' / 'kll:k=200:col=n_tok' → SketchSpec."""
    from sketch_spark.spark.agg import SketchSpec

    parts = arg.split(":")
    kind = parts[0]
    params: dict = {}
    col = default_col
    for kv in parts[1:]:
        k, _, v = kv.partition("=")
        if k == "col":
            col = v
        else:
            params[k] = float(v) if "." in v else int(v)
    name = f"{kind}_{col}"
    return SketchSpec(name, kind, col, params)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True, help="parquet directory of the token table")
    ap.add_argument("--col", default="tokens", help="default column to sketch")
    ap.add_argument(
        "--sketch",
        action="append",
        default=None,
        help="kind:param=value[:col=name] (repeatable; required except with --rollup)",
    )
    ap.add_argument(
        "--group-by",
        default=None,
        help="build one state per value of this column (comma-separate for composite keys, e.g. source,day)",
    )
    ap.add_argument(
        "--rollup",
        default=None,
        help="instead of building, ROLL UP an existing grouped-states parquet (--input) to these keys (comma-separated; empty string = global merge)",
    )
    ap.add_argument("--checkpoint", default=None, help="per-file lineage checkpoint dir (resumable)")
    ap.add_argument("--output", default=None, help="write states + estimates parquet here")
    ap.add_argument("--direct", action="store_true", default=True, help="parquet-direct scan (default)")
    ap.add_argument("--no-direct", dest="direct", action="store_false")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("sketch_spark_build").getOrCreate()
    from pyspark.sql import functions as F

    from sketch_spark.spark.agg import build_sketches, sketch_by_key
    from sketch_spark.spark.checkpoint import checkpointed_build
    from sketch_spark.spark.files import build_sketches_from_parquet, sketch_by_key_from_parquet

    if args.rollup is None and not args.sketch:
        ap.error("--sketch is required (except with --rollup)")
    specs = [parse_sketch(s, args.col) for s in args.sketch or []]
    t0 = time.time()

    if args.rollup is not None:
        from sketch_spark.spark.agg import rollup_states

        keep = [k for k in args.rollup.split(",") if k]
        states = rollup_states(spark.read.parquet(args.input), keep)
        if args.output:
            states.write.mode("overwrite").parquet(args.output)
        n = states.count()
        print(json.dumps({"mode": "rollup", "keep": keep, "states": n, "wall_s": round(time.time() - t0, 2)}))
        return 0

    if args.group_by:
        keys = args.group_by.split(",") if "," in args.group_by else args.group_by
        if args.direct:
            states = sketch_by_key_from_parquet(spark, args.input, keys, specs)
        else:
            states = sketch_by_key(spark.read.parquet(args.input), keys, specs)
        if args.output:
            states.write.mode("overwrite").parquet(args.output)
        n = states.count()
        print(json.dumps({"mode": "grouped", "states": n, "wall_s": round(time.time() - t0, 2)}))
        return 0

    if args.checkpoint:
        sketches = checkpointed_build(spark, args.input, specs, args.checkpoint)
    elif args.direct:
        sketches = build_sketches_from_parquet(spark, args.input, specs)
    else:
        sketches = build_sketches(spark.read.parquet(args.input), specs)

    report = {}
    for name, sk in sketches.items():
        entry: dict = {"kind": sk.kind, "state_bytes": len(sk.to_bytes())}
        if hasattr(sk, "estimate"):
            entry["estimate"] = float(sk.estimate())
        elif hasattr(sk, "cardinality_estimate"):
            entry["estimate"] = float(sk.cardinality_estimate())
        if hasattr(sk, "quantile"):
            entry["p50"] = float(sk.quantile(0.5))
        if hasattr(sk, "total"):
            entry["total"] = int(sk.total())
        report[name] = entry
    if args.output:
        rows = [(name, sk.kind, bytearray(sk.to_bytes())) for name, sk in sketches.items()]
        spark.createDataFrame(rows, "name string, kind string, state binary").write.mode(
            "overwrite"
        ).parquet(args.output)
    print(json.dumps({"mode": "global", "wall_s": round(time.time() - t0, 2), "sketches": report}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
