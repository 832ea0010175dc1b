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
    from bigdataindexing_spark.operators.multimodal import (
        PNG_DOC_IDS,
        PNG_STATS,
    )

    decoded = {r["doc_id"]: r for r in decode_image(media).collect()}
    for r in media.select("doc_id", "payload").collect():
        arr = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        d = decoded[r["doc_id"]]
        assert d["n_bytes"] == arr.size  # payload length, decoder-independent
        if r["doc_id"] in PNG_DOC_IDS:
            # planted real PNGs take the REAL decode path: provenance is
            # recorded and the stats are grayscale PIXEL stats matching
            # the known gradient exactly
            mean, mn, mx = PNG_STATS[r["doc_id"]]
            assert d["decoder"] == "png-pure"
            assert abs(d["byte_mean"] - mean) < 1e-9
            assert (d["byte_min"], d["byte_max"]) == (mn, mx)
        else:
            assert d["decoder"] == "fake-byte-stats"
            assert abs(d["byte_mean"] - arr.mean()) < 1e-9
    # the fixture's 60 docs include every planted id: the real path RAN
    assert all(decoded[i]["decoder"] == "png-pure" for i in PNG_DOC_IDS)


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
    # the vendored codec is always available: a real 2x2 PNG must take
    # the png-pure branch, report pixel stats, and keep n_bytes =
    # payload length — no skip, no optional dependency
    from bigdataindexing_spark.functions import png
    from bigdataindexing_spark.operators import multimodal as mm

    assert mm._HAS_REAL_CODEC
    payload = png.encode_gray(np.array([[0, 100], [200, 255]], dtype=np.uint8))
    doc_id, decoder, n_bytes, mean, mn, mx = mm._decode_one(9, payload)
    assert (doc_id, decoder, n_bytes) == (9, "png-pure", len(payload))
    assert (mn, mx) == (0, 255)
    assert abs(mean - np.mean([0, 100, 200, 255])) < 1e-9


def test_png_codec_filters_roundtrip():
    """The vendored decoder handles every PNG row-filter type and the
    common color types (the encoder only emits filter 0, so the filtered
    variants are crafted directly)."""
    import struct
    import zlib

    from bigdataindexing_spark.functions import png

    def make_png(color, channels, h, w, filters):
        rng = np.random.RandomState(7)
        px = rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8)
        stride = w * channels
        raw = bytearray()
        prev = np.zeros(stride, dtype=np.int16)
        flat = px.reshape(h, stride)
        for y in range(h):
            f = filters[y % len(filters)]
            cur = flat[y].astype(np.int16)
            left = np.concatenate([np.zeros(channels, np.int16), cur[:-channels]])
            if f == 0:
                enc = cur
            elif f == 1:
                enc = cur - left
            elif f == 2:
                enc = cur - prev
            elif f == 3:
                enc = cur - (left + prev) // 2
            else:  # paeth
                enc = np.zeros(stride, np.int16)
                for x in range(stride):
                    a = int(flat[y][x - channels]) if x >= channels else 0
                    b = int(prev[x])
                    c = int(prev[x - channels]) if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[x] = int(flat[y][x]) - pred
            raw.append(f)
            raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
            prev = flat[y].astype(np.int16)

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return px, (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
        )

    for color, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            px, data = make_png(color, ch, 7, 5, filters)
            assert (png.decode(data) == px).all(), (color, filters)

    # non-PNG payloads are rejected, not misparsed
    for bad in (b"", b"hello world", b"\x89PNG\r\n\x1a\nxxxx"):
        with pytest.raises(ValueError):
            png.decode(bad)


def test_png_codec_property_roundtrip():
    """Property fuzz: encode→decode is the identity for arbitrary uint8
    grayscale images, and arbitrary byte blobs either decode or raise
    ValueError (never a wrong parse or an unexpected exception type)."""
    from hypothesis import given, settings, strategies as st

    from bigdataindexing_spark.functions import png

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=24),
        w=st.integers(min_value=1, max_value=24),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def roundtrip(h, w, seed):
        arr = np.random.RandomState(seed).randint(
            0, 256, size=(h, w), dtype=np.uint8
        )
        dec = png.decode(png.encode_gray(arr))
        assert dec.shape == (h, w, 1)
        assert (dec[:, :, 0] == arr).all()

    @settings(max_examples=120, deadline=None)
    @given(blob=st.binary(max_size=256))
    def garbage(blob):
        try:
            out = png.decode(blob)
        except ValueError:
            return  # rejected — the expected outcome for non-PNG bytes
        # if it decoded, it must have been a structurally valid PNG,
        # which random blobs essentially never are; shape sanity only
        assert out.ndim == 3

    roundtrip()
    garbage()


def test_png_decode_corrupt_chunks_raise_valueerror():
    """Structurally corrupt PNGs (short IHDR -> struct.error, bad
    deflate stream -> zlib.error) must surface as ValueError so the
    per-item codec dispatch falls back to byte stats instead of
    crashing the Arrow batch."""
    import struct
    import zlib

    from bigdataindexing_spark.functions import png
    from bigdataindexing_spark.operators.multimodal import _decode_one

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    short_ihdr = sig + struct.pack(">I", 5) + b"IHDR" + b"abcde" + b"\0\0\0\0"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bad_idat = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"notdeflate") + chunk(b"IEND", b"")
    for payload in (short_ihdr, bad_idat):
        with pytest.raises(ValueError):
            png.decode(payload)
        assert _decode_one(1, payload)[1] == "fake-byte-stats"


def test_png_decode_bomb_payload_bounded_and_falls_back():
    """A decompression-bomb PNG (valid container, IHDR claiming absurd
    dimensions, or an IDAT inflating past the declared size) must raise
    ValueError WITHOUT materializing the inflated buffer, so an
    untrusted corpus can't blow executor memory (ADVICE r5). The
    per-item dispatch must fall back to byte stats, keeping the rest of
    the Arrow batch alive."""
    import struct
    import zlib

    from bigdataindexing_spark.functions import png
    from bigdataindexing_spark.operators.multimodal import _decode_one

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # 1 GB-of-raw grayscale claim (32768 x 32768) backed by a ~1 MB IDAT
    # of zeros: dimension check must reject before any inflation.
    huge_ihdr = struct.pack(">IIBBBBB", 32768, 32768, 8, 0, 0, 0, 0)
    bomb_dims = (
        sig
        + chunk(b"IHDR", huge_ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20), 9))
        + chunk(b"IEND", b"")
    )
    # Modest declared dims (4x4 gray, expected raw 20 bytes) but an IDAT
    # stream that inflates to 1 MB: the bounded decompressobj must stop
    # at expected+1 bytes and report a size mismatch.
    small_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb_stream = (
        sig
        + chunk(b"IHDR", small_ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20), 9))
        + chunk(b"IEND", b"")
    )
    # Zero-dimension image: expected size 0 would vacuously "match".
    zero_ihdr = struct.pack(">IIBBBBB", 0, 0, 8, 0, 0, 0, 0)
    zero_dims = (
        sig
        + chunk(b"IHDR", zero_ihdr)
        + chunk(b"IDAT", zlib.compress(b"", 9))
        + chunk(b"IEND", b"")
    )
    for payload in (bomb_dims, bomb_stream, zero_dims):
        with pytest.raises(ValueError):
            png.decode(payload)
        assert _decode_one(1, payload)[1] == "fake-byte-stats"
