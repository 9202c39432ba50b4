"""Pairwise similarity matrices over grouped sketch states.

Parity with the reference's Python-binding matrix APIs
(`jaccard_matrix`, `intersection_matrix`, `containment_matrix`,
`union_size_matrix` — /root/reference/python/hll.cpp:37-44,
python/pysketch.h:23-60, OpenMP pairwise loops): given the per-group states
produced by ``sketch_by_key`` (one kilobyte-scale state per group), compute
all n·(n-1)/2 pairwise similarities.

Scale shape: the heavy part (building per-group sketches over the raw data)
is the distributed job; the matrix over the resulting states is tiny
(|groups|² pairs of ≤KB states) and runs driver-side in NumPy — same
division of labor as the reference, where the matrix functions take already-
built sketches. For very large |groups| use ``pairwise_df`` which distributes
the pair loop with a states self-join."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Row, functions as F
from pyspark.sql.functions import pandas_udf

from sketch_spark.sketches.base import from_bytes

_METRICS = ("jaccard", "containment", "union_size", "intersection_size")


def _score(metric: str, a, b) -> float:
    if metric == "jaccard":
        return float(a.jaccard_index(b))
    if metric == "containment":
        return float(a.containment_index(b))
    if metric == "union_size":
        return float(a.union_size(b))
    if metric == "intersection_size":
        return float(a.intersection_size(b))
    raise ValueError(f"unknown metric {metric!r}; have {_METRICS}")


def pairwise_similarity(
    states: DataFrame, key: str, metric: str = "jaccard", name: str | None = None
) -> DataFrame:
    """All-pairs similarity from a (key, name, state) states DataFrame
    (driver-side loop over collected states — states are KBs; the data-heavy
    phase already happened in sketch_by_key)."""
    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}; have {_METRICS}")
    sdf = states if name is None else states.where(F.col("name") == name)
    rows = sdf.select(key, "state").collect()
    sketches = {r[key]: from_bytes(bytes(r["state"])) for r in rows}
    spark = states.sparkSession
    out = [
        Row(key_a=ka, key_b=kb, value=_score(metric, sketches[ka], sketches[kb]))
        for ka, kb in combinations(sorted(sketches), 2)
    ]
    schema = f"key_a string, key_b string, value double"
    return spark.createDataFrame(out, schema) if out else spark.createDataFrame([], schema)


def pairwise_df(states: DataFrame, key: str, metric: str = "jaccard") -> DataFrame:
    """Distributed variant: broadcast self-join of the states table + a
    pandas UDF scoring each pair — for when |groups| is large enough that
    n²/2 driver-side pairs would not fit (the shuffle moves only states)."""
    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}; have {_METRICS}")

    @pandas_udf("double")
    def score(sa, sb):
        import pandas as pd

        return pd.Series(
            [_score(metric, from_bytes(bytes(a)), from_bytes(bytes(b))) for a, b in zip(sa, sb)]
        )

    l = states.select(F.col(key).alias("key_a"), F.col("state").alias("sa"))
    r = states.select(F.col(key).alias("key_b"), F.col("state").alias("sb"))
    return (
        l.join(F.broadcast(r), F.col("key_a") < F.col("key_b"))
        .withColumn("value", score("sa", "sb"))
        .select("key_a", "key_b", "value")
    )
