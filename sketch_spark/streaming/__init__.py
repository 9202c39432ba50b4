"""Structured Streaming sketch builds."""

from sketch_spark.streaming.build import StreamingSketchBuild, stream_sketches  # noqa: F401
