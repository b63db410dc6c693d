"""Multimodal columns: images/audio/video as opaque ``binary`` + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels that need codec libraries (PIL/ffmpeg/soundfile — not
present in this environment) are STUBBED behind an import-try: when the
library is missing, a clearly-marked deterministic fake decoder runs instead
so the Spark-side plumbing — schema, batch shape, partitioning — is real and
tested end-to-end.  The fake decoder derives per-blob features from the
bytes themselves (length, a 16-bin byte histogram), so outputs are
deterministic across runs and parallelism levels.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

try:  # pragma: no cover - exercised only where PIL exists
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_decode(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a real image decode: pseudo-dimensions from
    the leading bytes, features = L1-normalized 16-bin byte histogram."""
    n = len(blob)
    width = 1 + (blob[0] if n > 0 else 0)
    height = 1 + (blob[1] if n > 1 else 0)
    hist, _ = np.histogram(np.frombuffer(blob, dtype=np.uint8), bins=16, range=(0, 256))
    total = hist.sum()
    feats = (hist / total).astype(np.float32) if total else np.zeros(16, np.float32)
    return width, height, feats


def decode_image_features(
    media: DataFrame, id_col: str = "media_id", blob_col: str = "media"
) -> DataFrame:
    """``(media_id, n_bytes, width, height, features[16])`` via mapInPandas.

    With a codec library installed the real decode would replace
    ``_fake_decode`` batch-for-batch (same schema, same Arrow plumbing).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob) if blob is not None else b""
                if _HAS_PIL:
                    # real decode path would go here; this environment has no
                    # codec libs, so even with PIL we use the deterministic
                    # fake to keep outputs reproducible
                    pass
                w, h, feats = _fake_decode(blob)
                rows.append((int(mid), len(blob), w, h, feats.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "width", "height", "features"]
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


def audio_stub(*_args, **_kwargs):
    """Audio decode requires a codec library not present in this container."""
    raise NotImplementedError(
        "audio decode needs soundfile/ffmpeg, which are not available here; "
        "use decode_image_features as the plumbing template"
    )
