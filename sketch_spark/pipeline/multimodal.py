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
    """Feature-detect Pillow. Absent in this container (no installs allowed
    here — `pip install pillow` is out of policy and was not attempted); on
    a real cluster with Pillow shipped via --py-files/conda, the decode path
    below activates automatically."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decoder_backend() -> str:
    """'pillow' when a real image codec is importable, else 'stub'."""
    return "pillow" if _try_real_decoder() else "stub"


def pil_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Real decode path (active when Pillow is importable): decode →
    grayscale → dim×dim thumbnail → row-mean signature. Same contract and
    output shape as :func:`fake_decode`, so the two are drop-in swaps."""
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(payload)) as im:
        g = im.convert("L").resize((dim, dim))
        arr = np.asarray(g, dtype=np.float32) / 255.0
    return arr.mean(axis=1)


def decode_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """The single decode swap point: Pillow when available (falling back to
    the stub for undecodable bytes), deterministic stub otherwise."""
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    if _try_real_decoder():
        try:  # pragma: no cover - Pillow not installed in this container
            return pil_decode(payload, dim)
        except Exception:
            return fake_decode(payload, dim)
    return fake_decode(payload, dim)


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
    the codec — unavoidable for opaque codecs — but all metadata and framing
    stay vectorized. `decode_feature` is the only swap point: it dispatches
    to Pillow when importable on the executors, else the deterministic stub.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_feature(bytes(p) if p is not None else b"", dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "ok": [p is not None for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id long, pixels array<float>, out_w int, out_h int, ok boolean"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary, n_frames int"

AUDIO_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration double, "
    "rms double, zcr double, band_energy array<float>, backend string"
)


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode path — stdlib ``wave`` only, so unlike the image
    codecs it is active in this container: parse RIFF/WAVE, normalize PCM
    (8-bit unsigned / 16- or 32-bit signed) to float32 in [−1, 1],
    downmix channels. Raises on non-WAV payloads (caller falls back to
    the stub)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported sample width {sw}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    x = (x - 128.0) / 128.0 if sw == 1 else x / float(2 ** (8 * sw - 1))
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


def audio_features(x: np.ndarray, sr: int, n_bands: int = 8) -> dict:
    """Vectorized summary features of a mono float waveform: RMS,
    zero-crossing rate, and n_bands equal-width magnitude-spectrum
    energies (normalized to sum 1 — a crude mel-free band profile)."""
    n = len(x)
    if n == 0:
        return {
            "sample_rate": sr,
            "n_samples": 0,
            "duration": 0.0,
            "rms": 0.0,
            "zcr": 0.0,
            "band_energy": [0.0] * n_bands,
        }
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float((np.diff(np.signbit(x)) != 0).mean()) if n > 1 else 0.0
    mag = np.abs(np.fft.rfft(x))
    bands = np.array_split(mag, n_bands)
    be = np.array([float((b * b).sum()) for b in bands])
    tot = be.sum()
    if tot > 0:
        be = be / tot
    return {
        "sample_rate": sr,
        "n_samples": n,
        "duration": n / sr if sr else 0.0,
        "rms": rms,
        "zcr": zcr,
        "band_energy": be.astype(np.float32).tolist(),
    }


def extract_audio_features(df: DataFrame, n_bands: int = 8) -> DataFrame:
    """mapInPandas audio featurization. RIFF/WAVE payloads go through the
    REAL stdlib decoder (``backend = 'wave'``); anything else falls back
    to the deterministic byte-signature stub (``backend = 'stub'``) so the
    plumbing keeps one contract across codecs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p, meta_sr in zip(pdf["media_id"], pdf["payload"], pdf["sample_rate"]):
                raw = bytes(p) if p is not None else b""
                try:
                    x, sr = wav_decode(raw)
                    feats, backend = audio_features(x, sr, n_bands), "wave"
                except Exception:
                    sig = fake_decode(raw, n_bands)
                    tot = float((sig * sig).sum())
                    feats = {
                        "sample_rate": int(meta_sr) if meta_sr else 0,
                        "n_samples": len(raw),
                        "duration": 0.0,
                        "rms": float(np.sqrt(np.mean(sig * sig))) if len(sig) else 0.0,
                        "zcr": 0.0,
                        "band_energy": (sig * sig / tot if tot else sig).tolist(),
                    }
                    backend = "stub"
                rows.append(
                    {
                        "media_id": mid,
                        **{k: feats[k] for k in ("sample_rate", "n_samples", "duration", "rms", "zcr", "band_energy")},
                        "backend": backend,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, AUDIO_SCHEMA)


def synth_wav_bytes(freq_hz: float, sr: int = 8000, seconds: float = 0.25, amp: float = 0.5) -> bytes:
    """In-memory 16-bit mono WAV of a sine tone — real bytes for the real
    decoder, deterministic for tests."""
    import io
    import wave

    t = np.arange(int(sr * seconds)) / sr
    pcm = (np.sin(2 * np.pi * freq_hz * t) * amp * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def fake_decode_image(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for an image codec: (h, w) float32 'pixels'
    from the byte stream (tiled + scaled). Swap for PIL decode in prod."""
    if not payload:
        return np.zeros((h, w), dtype=np.float32)
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float32) / 255.0
    reps = int(np.ceil(w * h / len(b)))
    return np.tile(b, reps)[: w * h].reshape(h, w)


def _area_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure NumPy (the real op would be
    PIL/cv2.resize; the batching/schema plumbing is identical)."""
    h, w = img.shape
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


def resize_images(df: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Decode → resize over the binary payload column (mapInPandas).
    Output pixels are row-major float32 of shape (out_h, out_w)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pix, ok = [], []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                try:
                    img = fake_decode_image(bytes(p) if p is not None else b"", int(w), int(h))
                    pix.append(_area_resize(img, out_w, out_h).ravel().tolist())
                    ok.append(True)
                except Exception:
                    pix.append([0.0] * (out_w * out_h))
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "pixels": pix,
                    "out_w": out_w,
                    "out_h": out_h,
                    "ok": ok,
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Deterministic frame sampling from a 'video' payload: n_frames evenly
    spaced fixed-size byte windows (a real codec would seek keyframes; the
    explode/schema shape — one row per (media, frame) — is the production
    contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, totals = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                if len(raw) < frame_bytes:
                    raw = raw + b"\x00" * (frame_bytes - len(raw))
                max_start = len(raw) - frame_bytes
                starts = (np.linspace(0, max_start, n_frames)).astype(int)
                for i, s in enumerate(starts):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[s : s + frame_bytes])
                    totals.append(n_frames)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames, "n_frames": totals}
            )

    return df.mapInPandas(run, FRAMES_SCHEMA)


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        size = int(rng.integers(16, 256))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        rows.append((i, bytearray(payload), "image/fake", 4, 4, 0))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
