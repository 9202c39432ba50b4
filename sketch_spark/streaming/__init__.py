"""Structured Streaming sketch builds."""

from sketch_spark.streaming.build import StreamingSketchBuild, stream_sketches  # noqa: F401
from sketch_spark.streaming.stateful import stateful_sketch_by_key  # noqa: F401
from sketch_spark.streaming.windowed import windowed_sketch_stream  # noqa: F401
