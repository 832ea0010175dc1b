"""Contracts for the multimodal binary-column operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataindexing_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    N_HIST_BINS,
    as_media,
    decode_image,
    extract_features,
    resize_image,
    sample_frames,
)
from bigdataindexing_spark.tables import table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return as_media(table(spark, sf_dir, "documents").limit(60)).cache()


def test_media_schema_and_types(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta_fields = {f.name for f in media.schema["meta"].dataType.fields}
    assert meta_fields == {"n_bytes", "width", "height", "sample_rate", "fps"}
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_feature_histogram_matches_numpy(media):
    rows = media.select("doc_id", "payload").orderBy("doc_id").limit(5).collect()
    got = {
        r["doc_id"]: r["features"]
        for r in extract_features(media).collect()
    }
    for r in rows:
        arr = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        expect = np.bincount(arr >> 4, minlength=N_HIST_BINS) / arr.size
        assert np.allclose(got[r["doc_id"]], expect)
        assert abs(sum(got[r["doc_id"]]) - 1.0) < 1e-9


def test_decode_stats_match_payload_bytes(media):
    decoded = {r["doc_id"]: r for r in decode_image(media).collect()}
    for r in media.select("doc_id", "payload").collect():
        arr = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        d = decoded[r["doc_id"]]
        assert d["n_bytes"] == arr.size
        assert abs(d["byte_mean"] - arr.mean()) < 1e-9
        assert d["decoder"] == "fake-byte-stats"


def test_frame_sampling_matches_python_chunking(media):
    frames = sample_frames(media).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    videos = media.filter(F.col("media_type") == "video").collect()
    assert len(videos) > 0
    for v in videos:
        payload = bytes(v["payload"])
        chunks = [
            payload[i : i + FRAME_BYTES]
            for i in range(0, len(payload), FRAME_BYTES)
        ][::FRAME_STRIDE]
        got = sorted(by_doc[v["doc_id"]], key=lambda r: r["frame_idx"])
        assert [bytes(g["frame"]) for g in got] == chunks
        assert [g["frame_idx"] for g in got] == list(
            range(0, len(chunks) * FRAME_STRIDE, FRAME_STRIDE)
        )


def test_resize_rewrites_meta_passes_payload(media):
    resized = resize_image(media, 224, 224)
    row = resized.select("meta.width", "meta.height", "payload").first()
    assert (row["width"], row["height"]) == (224, 224)
    assert len(bytes(row["payload"])) > 0


def test_decode_one_fake_path_byte_stats():
    # direct unit check of the per-item codec dispatch (no Spark needed):
    # a payload that is NOT a decodable image must yield byte statistics
    # tagged with the fake decoder, whether or not Pillow is installed
    from bigdataindexing_spark.operators.multimodal import _decode_one

    row = _decode_one(7, b"\x01\x02\x03\x04")
    assert row == (7, "fake-byte-stats", 4, 2.5, 1, 4)


def test_decode_one_empty_payload():
    from bigdataindexing_spark.operators.multimodal import _decode_one

    assert _decode_one(1, b"") == (1, "fake-byte-stats", 0, 0.0, 0, 0)


def test_decode_one_real_codec_path():
    # only runs where Pillow exists: a real 2x2 PNG must take the PIL
    # branch, report pixel stats, and keep n_bytes = payload length
    import pytest

    from bigdataindexing_spark.operators import multimodal as mm

    if not mm._HAS_REAL_CODEC:
        pytest.skip("Pillow not installed; real-codec path exercised only where it exists")
    import io

    import numpy as np

    img = mm._PILImage.new("L", (2, 2))
    img.putdata([0, 100, 200, 255])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()
    doc_id, decoder, n_bytes, mean, mn, mx = mm._decode_one(9, payload)
    assert (doc_id, decoder, n_bytes) == (9, "pil", len(payload))
    assert (mn, mx) == (0, 255)
    assert abs(mean - np.mean([0, 100, 200, 255])) < 1e-9
