"""Table sources for the token corpus."""

from sketch_spark.sources.tables import load_table, write_table  # noqa: F401
