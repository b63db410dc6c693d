"""Multimodal columns: images/audio/video as opaque ``binary`` + typed
metadata, processed via Arrow-batched ``mapInPandas``.

Decode dispatch: when PIL is importable AND a blob parses as a real image,
the REAL decode runs (dimensions from the codec, features = L1-normalized
16-bin grayscale histogram); otherwise — missing library or undecodable
bytes — the clearly-marked deterministic byte-level fallback runs
(pseudo-dimensions from the leading bytes, features = 16-bin byte
histogram), keeping the Spark-side plumbing (schema, batch shape,
partitioning) identical and every output deterministic across runs and
parallelism levels.  The ``decoder`` column records which path produced
each row, so a mixed or codec-less corpus is never silently misread as
decoded.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:
    from PIL import Image

    _HAS_PIL = True
except ImportError:  # codec library absent in this container
    Image = None
    _HAS_PIL = False


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
        StructField("decoder", StringType()),
    ]
)


def _byte_histogram_decode(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic byte-level fallback: pseudo-dimensions from the leading
    bytes, features = L1-normalized 16-bin byte histogram."""
    n = len(blob)
    width = 1 + (blob[0] if n > 0 else 0)
    height = 1 + (blob[1] if n > 1 else 0)
    hist, _ = np.histogram(np.frombuffer(blob, dtype=np.uint8), bins=16, range=(0, 256))
    total = hist.sum()
    feats = (hist / total).astype(np.float32) if total else np.zeros(16, np.float32)
    return width, height, feats


def _pil_decode(blob: bytes):
    """Real image decode: (width, height, 16-bin grayscale histogram) or
    None when the bytes are not a decodable image."""
    try:
        img = Image.open(io.BytesIO(blob))
        img.load()
    except Exception:
        return None
    gray = np.asarray(img.convert("L"), dtype=np.uint8)
    hist, _ = np.histogram(gray, bins=16, range=(0, 256))
    total = hist.sum()
    feats = (hist / total).astype(np.float32) if total else np.zeros(16, np.float32)
    return img.width, img.height, feats


def decode_one_image(blob: bytes) -> tuple[int, int, np.ndarray, str]:
    """Per-blob decode dispatch: the real codec when PIL is importable AND
    the bytes parse, else the deterministic byte-level fallback.  Module-
    level so the PIL branch is unit-testable with a stubbed codec even in
    containers without PIL (tests/test_multimodal_streaming.py)."""
    decoded = _pil_decode(blob) if _HAS_PIL else None
    if decoded is not None:
        w, h, feats = decoded
        return w, h, feats, "pil"
    w, h, feats = _byte_histogram_decode(blob)
    return w, h, feats, "byte-histogram"


def decode_image_features(
    media: DataFrame, id_col: str = "media_id", blob_col: str = "media"
) -> DataFrame:
    """``(media_id, n_bytes, width, height, features[16], decoder)`` via
    mapInPandas; ``decoder`` ∈ {'pil', 'byte-histogram'} names the path that
    produced the row (real codec vs deterministic fallback)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob) if blob is not None else b""
                w, h, feats, decoder = decode_one_image(blob)
                rows.append((int(mid), len(blob), w, h, feats.tolist(), decoder))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "width", "height", "features", "decoder",
                ],
            )

    return media.mapInPandas(_decode, IMAGE_FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", ArrayType(IntegerType())),
    ]
)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 16,
    stride: int = 4,
    id_col: str = "media_id",
    blob_col: str = "media",
) -> DataFrame:
    """Frame-sampling plumbing for video-like blobs: split the byte stream
    into fixed-size chunks ("frames") and keep every ``stride``-th one.
    A real implementation swaps the chunker for an ffmpeg keyframe extractor;
    the batch shape (one output row per sampled frame, explode-style fan-out
    inside mapInPandas) is exactly what the real kernel needs."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob) if blob is not None else b""
                n_frames = len(blob) // frame_bytes
                for j in range(0, n_frames, stride):
                    chunk = blob[j * frame_bytes : (j + 1) * frame_bytes]
                    out_ids.append(int(mid))
                    out_idx.append(j)
                    out_frames.append(list(chunk))
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return media.mapInPandas(_sample, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),
        StructField("decoder", StringType()),
    ]
)


def resize_one_image(blob: bytes, width: int, height: int) -> tuple[bytes, str]:
    """Resize to a ``width×height`` grayscale byte grid.  PIL path: real
    decode + ``Image.resize`` + L-convert.  Fallback: the blob's bytes laid
    out on the pseudo-dimension grid from :func:`_byte_histogram_decode`
    and nearest-neighbor sampled — deterministic, codec-free, same output
    shape, and labeled by the ``decoder`` value."""
    if _HAS_PIL:
        try:
            img = Image.open(io.BytesIO(blob))
            img.load()
            gray = np.asarray(
                img.resize((width, height)).convert("L"), dtype=np.uint8
            )
            return gray.tobytes(), "pil"
        except Exception:
            pass
    w0, h0, _ = _byte_histogram_decode(blob)
    grid = np.zeros(w0 * h0, dtype=np.uint8)
    src = np.frombuffer(blob, dtype=np.uint8)[: w0 * h0]
    grid[: len(src)] = src
    grid = grid.reshape(h0, w0)
    ys = (np.arange(height) * h0) // height
    xs = (np.arange(width) * w0) // width
    return grid[np.ix_(ys, xs)].tobytes(), "byte-grid"


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    blob_col: str = "media",
) -> DataFrame:
    """``(media_id, width, height, pixels binary, decoder)`` — every output
    blob is exactly ``width*height`` grayscale bytes, whichever path ran."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob) if blob is not None else b""
                px, decoder = resize_one_image(blob, width, height)
                rows.append((int(mid), width, height, px, decoder))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixels", "decoder"]
            )

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


try:
    import soundfile as _soundfile

    _HAS_SOUNDFILE = True
except ImportError:  # codec library absent in this container
    _soundfile = None
    _HAS_SOUNDFILE = False


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", FloatType()),
        StructField("zero_crossings", IntegerType()),
        StructField("peak", IntegerType()),
        StructField("decoder", StringType()),
    ]
)


def decode_audio_features(
    media: DataFrame, id_col: str = "media_id", blob_col: str = "media"
) -> DataFrame:
    """``(media_id, n_bytes, n_samples, rms, zero_crossings, peak, decoder)``.

    Compressed formats decode through soundfile when importable
    (``decoder='soundfile'``); otherwise the blob is interpreted as raw
    16-bit little-endian PCM (``decoder='pcm16'``) — raw PCM needs no codec
    library, so this path is a REAL signal kernel, not a fake: RMS energy,
    zero-crossing count and peak amplitude over the int16 samples,
    deterministic across runs and parallelism levels (a trailing odd byte
    is ignored, matching PCM frame alignment)."""

    def _features(samples: np.ndarray) -> tuple[int, float, int, int]:
        if samples.size == 0:
            return 0, 0.0, 0, 0
        x = samples.astype(np.float64)
        rms = float(np.sqrt(np.mean(x * x)))
        signs = np.signbit(x)
        zc = int(np.count_nonzero(signs[1:] != signs[:-1]))
        return int(samples.size), rms, zc, int(np.max(np.abs(x)))

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob) if blob is not None else b""
                samples = None
                decoder = "pcm16"
                if _HAS_SOUNDFILE:
                    try:
                        data, _sr = _soundfile.read(io.BytesIO(blob), dtype="int16")
                        samples = np.asarray(data).reshape(-1)
                        decoder = "soundfile"
                    except Exception:
                        samples = None
                if samples is None:
                    usable = len(blob) - (len(blob) % 2)
                    samples = np.frombuffer(blob[:usable], dtype="<i2")
                    decoder = "pcm16"
                n, rms, zc, peak = _features(samples)
                rows.append((int(mid), len(blob), n, rms, zc, peak, decoder))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "n_samples", "rms",
                    "zero_crossings", "peak", "decoder",
                ],
            )

    return media.mapInPandas(_decode, AUDIO_FEATURES_SCHEMA)
