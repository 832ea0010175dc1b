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
