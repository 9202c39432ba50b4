"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct
(mime, width/height or sample rate, etc.). The Spark-side plumbing — schema,
partition-preserving mapInPandas, Arrow batch shapes — is real and tested;
the actual codecs aren't available in this container, so the decode step is
a clearly-marked deterministic stub (`fake_decode`) behind the same UDF
signature a real decoder would use (SURVEY-mandated stub policy).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, payload binary, mime string, width int, height int, sample_rate int"
)

FEATURE_SCHEMA = "media_id long, feature array<float>, n_bytes int, ok boolean"


def _try_real_decoder():
    """Real decoders (Pillow / soundfile) are absent here by design."""
    try:  # pragma: no cover - not installed in this environment
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract: a dim-length float
    signature of the bytes (chunked means). Replace with a real decoder by
    swapping this function; the Spark plumbing is identical."""
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    pad = (-len(b)) % dim
    if pad:
        b = np.concatenate([b, np.zeros(pad, dtype=np.float32)])
    return b.reshape(dim, -1).mean(axis=1) / 255.0


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batched: each pandas chunk is processed with one Python call per row for
    the (stubbed) codec — unavoidable for opaque codecs — but all metadata
    and framing stay vectorized. If a real decoder were installed,
    `fake_decode` is the only swap point.
    """
    if _try_real_decoder():  # pragma: no cover
        raise NotImplementedError(
            "real image/audio decode not wired up in this environment; "
            "swap fake_decode for the codec call"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode(bytes(p) if p is not None else b"", dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "ok": [p is not None for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        size = int(rng.integers(16, 256))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        rows.append((i, bytearray(payload), "image/fake", 4, 4, 0))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
