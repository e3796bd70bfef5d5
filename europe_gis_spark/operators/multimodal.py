"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a metadata
struct, processed by Arrow-batched ``mapInPandas`` UDFs — the identical
plumbing the reference uses for raw raster scanlines
(``/root/reference/scripts/old_files/build_dem.py:63-79``:
``struct.unpack`` over binary) generalized to media.

The actual codecs (PIL/ffmpeg) are NOT in this container, so the decode
step is stubbed: ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded from
the payload bytes) exercises the full Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — which IS real and
tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = "width int, height int, channels int, format string"


def codecs_available() -> bool:
    """True iff a real image codec (PIL) is importable (not in this
    container — the capability gate mirrors lineage.iceberg_available)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def decode_image(payload: bytes, fake: bool | None = None) -> np.ndarray:
    """Decode an image payload to (H, W, C) uint8.

    STUB: real decode requires PIL/libjpeg (not installed). The default
    (``fake=None``) auto-detects: real codec when available, else the
    deterministic fake decoder (8×8×3 from the payload digest) — so
    PIPELINES NEVER HIT A RAISE at runtime. Pass ``fake=False`` to
    require a real codec (raises loudly when absent).
    """
    if fake is None:
        fake = not codecs_available()
    if not fake:
        if not codecs_available():
            raise NotImplementedError(
                "image codecs not available in this environment; pass "
                "fake=True (or leave the default) for the deterministic "
                "test decoder"
            )
        import io

        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("RGB"))
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return arr.reshape(8, 8, 3).copy()


FEATURES_SCHEMA = "key string, mean_r double, mean_g double, mean_b double, phash string"


def image_features(
    df: DataFrame, key_col: str = "url", payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Decode → per-channel means + perceptual-hash-style digest, one
    Arrow batch at a time (the W4 batched-UDF shape)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            keys = b[key_col].tolist()
            means = np.zeros((len(b), 3))
            hashes = []
            for i, payload in enumerate(b[payload_col].tolist()):
                img = decode_image(payload, fake=fake)
                means[i] = img.reshape(-1, 3).mean(axis=0)
                coarse = img[::4, ::4].mean(axis=2)
                bits = (coarse > coarse.mean()).ravel()
                hashes.append("".join("1" if x else "0" for x in bits))
            yield pd.DataFrame(
                {
                    "key": keys,
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "phash": hashes,
                }
            )

    return df.select(key_col, payload_col).mapInPandas(fn, schema=FEATURES_SCHEMA)


def frame_sample_stub(payload: bytes, every_n: int = 10, fake: bool = False) -> list[np.ndarray]:
    """Video frame sampling STUB (no ffmpeg in container): deterministic
    fake yields 3 synthetic frames derived from the payload digest."""
    if not fake:
        raise NotImplementedError("video codecs not available; pass fake=True")
    return [decode_image(payload + bytes([i]), fake=True) for i in range(3)]


def decode_audio(payload: bytes, fake: bool | None = None) -> np.ndarray:
    """Decode an audio payload to a mono float32 waveform in [-1, 1].

    STUB: real decode needs libsndfile/ffmpeg (absent here); the default
    auto-detect falls back to a deterministic fake (1024 samples from
    the payload digest) so pipelines never raise. ``fake=False``
    requires a real codec and raises loudly."""
    if fake is None:
        fake = True  # no audio codec is importable in this container
    if not fake:
        raise NotImplementedError("audio codecs not available; pass fake=True")
    digest = hashlib.sha256(b"audio:" + (payload or b"")).digest()
    raw = np.frombuffer((digest * 128)[: 1024 * 2], dtype="<i2")
    return (raw.astype(np.float32) / 32768.0).copy()


AUDIO_SCHEMA = "key string, n_samples int, rms double, zero_crossings int"


def audio_features(
    df: DataFrame, key_col: str = "url", payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Decode → RMS energy + zero-crossing count per clip, one Arrow
    batch at a time — the same typed-binary-column plumbing as
    image_features applied to the audio modality."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            ns = np.zeros(n, dtype=np.int32)
            rms = np.zeros(n)
            zc = np.zeros(n, dtype=np.int32)
            for i, payload in enumerate(b[payload_col].tolist()):
                w = decode_audio(payload, fake=fake)
                ns[i] = len(w)
                rms[i] = float(np.sqrt(np.mean(w * w)))
                zc[i] = int(np.count_nonzero(np.diff(np.signbit(w))))
            yield pd.DataFrame(
                {
                    "key": b[key_col],
                    "n_samples": ns,
                    "rms": rms,
                    "zero_crossings": zc,
                }
            )

    return df.select(key_col, payload_col).mapInPandas(fn, schema=AUDIO_SCHEMA)
