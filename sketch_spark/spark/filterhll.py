"""Threshold-distinct: count distinct values that occur at least t times.

The distributed restatement of the reference's FilterHLL composition
(filterhll.h:11-113 — insert into an HLL only when the counting filter says
the item's count reached a threshold). The reference gates on a counting
Bloom filter over a single stream; a per-partition gate is only correct if
every copy of a value lands in the same partition, so the plan is:

    repartition(col)                 [one hash shuffle co-locates values]
    → mapInArrow per partition:      [CMS counts values, batch uniques whose
        CMS count ≥ t go into an HLL; re-inserting is free — HLL dedups]
    → np.maximum-merge of HLL states [tiny; one collect]

Memory per task is fixed (one CMS + one HLL) regardless of partition size —
the point of the composition versus an exact GROUP BY ... HAVING, whose
per-key state grows with the number of distinct keys. CMS overestimation can
only add items (est ≥ true count), matching the reference's one-sided
error; size the CMS width so ε·N stays below 1 for exactness at test scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from sketch_spark.sketches.base import from_bytes, make_sketch
from sketch_spark.sketches.hll import HyperLogLog
from sketch_spark.spark.agg import _extract_column


def threshold_distinct_sketch(
    df: DataFrame,
    col: str,
    threshold: int,
    p: int = 14,
    l2sz: int = 18,
    nh: int = 4,
    seed: int = 137,
) -> HyperLogLog:
    """HLL of the distinct values occurring ≥ threshold times in ``df[col]``."""
    t = int(threshold)

    def gate(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        cms = make_sketch("cms", l2sz=l2sz, nh=nh, seed=seed)
        hll = make_sketch("hll", p=p)
        for batch in batches:
            vals = _extract_column(batch, col, want_float=False)
            if len(vals) == 0:
                continue
            cms.update(vals)
            uniq = np.unique(vals)
            passed = uniq[cms.query(uniq) >= t]
            # a value's LAST occurrence necessarily sees its full CMS count,
            # so every qualifying value is inserted by the batch where it
            # crosses t (earlier re-inserts are idempotent in the HLL)
            if len(passed):
                hll.update(passed)
        yield pa.RecordBatch.from_arrays([pa.array([hll.to_bytes()], pa.binary())], names=["state"])

    states = df.select(col).repartition(col).mapInArrow(gate, "state binary")
    out = make_sketch("hll", p=p)
    for r in states.collect():
        out.merge(from_bytes(bytes(r["state"])))
    return out


def threshold_distinct(df: DataFrame, col: str, threshold: int, **kwargs) -> float:
    """Scalar estimate of |{v : count(v) ≥ threshold}|."""
    return threshold_distinct_sketch(df, col, threshold, **kwargs).estimate()
