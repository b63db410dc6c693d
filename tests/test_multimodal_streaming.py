"""Multimodal mapInPandas plumbing + streaming serve tests."""

import json
import os

import pytest
from pyspark.sql import functions as F

from suggest_spark.config import DEFAULT_CONFIG
from suggest_spark.functions.metrics import JACCARD
from suggest_spark.operators.indexing import build_ngram_index
from suggest_spark.operators.multimodal import (
    decode_audio_features,
    decode_image_features,
    sample_frames,
)
from suggest_spark.streaming.serve import serve_suggest_stream, windowed_event_counts

CARS8 = [
    "Nissan March", "Nissan Juke", "Nissan Maxima", "Nissan Murano",
    "Nissan Note", "Toyota Mark II", "Toyota Corolla", "Toyota Corona",
]


def _media_df(spark):
    rows = [(i, bytes([i * 3 % 256, i * 7 % 256]) + bytes(range(40))) for i in range(6)]
    return spark.createDataFrame(rows, "media_id long, media binary")


def test_decode_image_features(spark):
    out = decode_image_features(_media_df(spark)).collect()
    assert len(out) == 6
    for r in out:
        assert r["n_bytes"] == 42
        assert r["width"] >= 1 and r["height"] >= 1
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-5

    # deterministic across runs and partitioning
    again = decode_image_features(_media_df(spark).repartition(5)).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


def test_sample_frames(spark):
    out = sample_frames(_media_df(spark), frame_bytes=8, stride=2).collect()
    # 42 bytes → 5 full frames → indices 0, 2, 4 sampled
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 2, 4] for v in by_id.values())
    assert all(len(r["frame"]) == 8 for r in out)


def test_decode_image_reports_decoder_path(spark):
    """Decode dispatch is real: non-image bytes always take the documented
    deterministic fallback (and with PIL absent, so does everything)."""
    out = decode_image_features(_media_df(spark)).collect()
    assert {r["decoder"] for r in out} == {"byte-histogram"}


def test_decode_audio_pcm16(spark):
    """Raw PCM16 audio kernel: exact RMS / zero-crossings / peak on a known
    square wave (no codec library needed — this is a real decode path)."""
    import struct

    square = struct.pack("<8h", 1000, 1000, -1000, -1000, 1000, 1000, -1000, -1000)
    silence = struct.pack("<4h", 0, 0, 0, 0)
    df = spark.createDataFrame(
        [(0, square), (1, silence), (2, b""), (3, square + b"\x01")],  # odd byte
        "media_id long, media binary",
    )
    got = {r["media_id"]: r for r in decode_audio_features(df).collect()}
    assert got[0]["n_samples"] == 8
    assert abs(got[0]["rms"] - 1000.0) < 1e-3
    assert got[0]["zero_crossings"] == 3
    assert got[0]["peak"] == 1000
    assert got[1]["rms"] == 0.0 and got[1]["zero_crossings"] == 0
    assert got[2]["n_samples"] == 0
    assert got[3]["n_samples"] == 8  # trailing odd byte ignored
    assert all(r["decoder"] in ("pcm16", "soundfile") for r in got.values())


def test_streaming_suggest(spark, tmp_path):
    """File-source query stream → foreachBatch suggest → collected results
    must equal the batch goldens."""
    qdir = tmp_path / "queries"
    qdir.mkdir()
    with open(qdir / "batch1.json", "w") as f:
        f.write(json.dumps({"query_id": 0, "query": "Nissan ma"}) + "\n")
        f.write(json.dumps({"query_id": 1, "query": "toyota co"}) + "\n")

    dictionary = spark.createDataFrame(list(enumerate(CARS8)), "doc_id long, value string")
    index = build_ngram_index(dictionary, config=DEFAULT_CONFIG)

    stream = (
        spark.readStream.schema("query_id long, query string")
        .json(str(qdir))
    )
    results = []

    def sink(batch_df, batch_id):
        results.extend(batch_df.collect())

    q = serve_suggest_stream(stream, index, JACCARD, 0.5, 2, sink, DEFAULT_CONFIG)
    q.awaitTermination(120)

    by_q = {}
    for r in sorted(results, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert by_q[0] == [2, 0]  # the reference golden
    assert 6 in by_q.get(1, []) or 7 in by_q.get(1, [])


def test_windowed_event_counts_batch_parity(spark, tmp_path):
    """Streaming windowed agg (availableNow over a file source) produces the
    same counts as the equivalent batch aggregation."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "ts", "event_type"
    )
    edir = str(tmp_path / "events_parquet")
    events.write.parquet(edir)

    stream = spark.readStream.schema(events.schema).parquet(edir)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")

    out_rows = []

    def sink(batch_df, batch_id):
        out_rows.extend(batch_df.collect())

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    want = {(r["win"]["start"], r["event_type"]): r["n_events"] for r in batch}
    got = {(r["window_start"], r["event_type"]): r["n_events"] for r in out_rows}
    assert got == want


def test_pil_branch_with_stubbed_codec(monkeypatch):
    """Execute the REAL-decode branch without PIL installed: stub the codec
    object so Image.open returns a decodable 2x2 image, and assert the
    dispatch takes the 'pil' path with the codec's dimensions and a correct
    grayscale histogram; undecodable bytes must still fall back."""
    import numpy as np

    from suggest_spark.operators import multimodal as mm

    class FakeImg:
        width, height = 2, 2

        def load(self):
            pass

        def convert(self, mode):
            assert mode == "L"
            return np.array([[0, 16], [240, 255]], dtype=np.uint8)

    class FakeImage:
        @staticmethod
        def open(buf):
            if buf.read(4) != b"IMG!":
                raise ValueError("not an image")
            return FakeImg()

    monkeypatch.setattr(mm, "Image", FakeImage)
    monkeypatch.setattr(mm, "_HAS_PIL", True)

    w, h, feats, decoder = mm.decode_one_image(b"IMG!rest-of-blob")
    assert (w, h, decoder) == (2, 2, "pil")
    # pixels 0,16 -> bins 0,1; 240,255 -> bin 15; L1-normalized
    want = np.zeros(16, np.float32)
    want[0], want[1], want[15] = 0.25, 0.25, 0.5
    assert np.allclose(feats, want)

    _, _, _, decoder2 = mm.decode_one_image(b"\x89not-an-image")
    assert decoder2 == "byte-histogram"


def test_resize_images_fallback_deterministic(spark):
    """Fallback resize: byte-grid nearest-neighbor, exact numpy oracle,
    fixed output size regardless of input bytes."""
    import numpy as np

    from suggest_spark.operators.multimodal import resize_images, resize_one_image

    blobs = [(0, bytes(range(4, 254))), (1, b"\x07\x03abcdefgh"), (2, b"")]
    df = spark.createDataFrame(blobs, "media_id long, media binary")
    rows = {r["media_id"]: r for r in resize_images(df, 4, 3).collect()}
    for mid, blob in blobs:
        r = rows[mid]
        assert (r["width"], r["height"], r["decoder"]) == (4, 3, "byte-grid")
        assert len(bytes(r["pixels"])) == 12
        # numpy oracle
        want, dec = resize_one_image(blob, 4, 3)
        assert bytes(r["pixels"]) == want and dec == "byte-grid"
    # deterministic grid content for a known blob: w0=8, h0=4 from leading
    # bytes of blob 1 -> sampled indices reproducible
    w0, h0, _ = __import__(
        "suggest_spark.operators.multimodal", fromlist=["x"]
    )._byte_histogram_decode(blobs[1][1])
    assert (w0, h0) == (8, 4)


def test_resize_images_pil_branch_stubbed(monkeypatch):
    import numpy as np

    from suggest_spark.operators import multimodal as mm

    class FakeResized:
        def convert(self, mode):
            assert mode == "L"
            return np.full((3, 4), 7, dtype=np.uint8)

    class FakeImg:
        def load(self):
            pass

        def resize(self, wh):
            assert wh == (4, 3)
            return FakeResized()

    class FakeImage:
        @staticmethod
        def open(buf):
            return FakeImg()

    monkeypatch.setattr(mm, "Image", FakeImage)
    monkeypatch.setattr(mm, "_HAS_PIL", True)
    px, decoder = mm.resize_one_image(b"whatever", 4, 3)
    assert decoder == "pil" and px == bytes([7] * 12)
