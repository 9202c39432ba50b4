"""Source/sink abstraction for the token corpus: parquet today, Iceberg when
the runtime has the catalog jars.

The north-star deployment reads Iceberg tables of pre-tokenized sequences
(BASELINE.json input_hint). This sandbox has no Iceberg runtime jars, so
`fmt="iceberg"` is a real code path that activates when
`spark.sql.catalog.*` is configured and raises a clear error otherwise —
the parquet path is byte-equivalent for every operator in this repo (all
operators consume a DataFrame; only scan planning differs, and Iceberg
scan pruning is strictly better thanks to partition stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TOKEN_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        return any(
            k.startswith("spark.sql.catalog.")
            for k, _ in (spark.sparkContext.getConf().getAll() or [])
        )
    except Exception:  # pragma: no cover
        return False


def load_table(spark: SparkSession, location: str, fmt: str = "parquet") -> DataFrame:
    """Load the token table. ``fmt``: 'parquet' (path) or 'iceberg'
    (catalog.db.table identifier)."""
    if fmt == "parquet":
        return spark.read.parquet(location)
    if fmt == "iceberg":
        if not _iceberg_available(spark):
            raise RuntimeError(
                "no Iceberg catalog configured on this session "
                "(set spark.sql.catalog.<name> via spark-submit --conf); "
                "use fmt='parquet' in this sandbox"
            )
        return spark.read.table(location)
    raise ValueError(f"unknown fmt {fmt!r}; have parquet, iceberg")


def write_table(df: DataFrame, location: str, fmt: str = "parquet", mode: str = "append") -> None:
    """Write states/results. Iceberg writes become `writeTo(...).append()`
    when a catalog is present."""
    if fmt == "parquet":
        df.write.mode(mode).parquet(location)
        return
    if fmt == "iceberg":
        if not _iceberg_available(df.sparkSession):
            raise RuntimeError("no Iceberg catalog configured; use fmt='parquet'")
        w = df.writeTo(location)
        (w.append() if mode == "append" else w.createOrReplace())
        return
    raise ValueError(f"unknown fmt {fmt!r}; have parquet, iceberg")
