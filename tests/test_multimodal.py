"""Multimodal binary-column plumbing: schema, Arrow batch shape, stubbed
codec behavior (deterministic fake decode; NotImplementedError on real
formats)."""

import numpy as np
import pytest

from linkgraph import multimodal as mm


def test_payload_stats_jvm_only(spark):
    df = mm.synth_media_df(spark, n=6)
    got = {r["media_id"]: r for r in mm.payload_stats(df).collect()}
    for i in range(6):
        payload = mm.fake_image(i) if i % 2 == 0 else mm.fake_audio(i)
        assert got[i]["n_bytes"] == len(payload)


def test_extract_features_fake_codecs(spark):
    df = mm.synth_media_df(spark, n=8)
    got = {r["media_id"]: r for r in mm.extract_features(df).collect()}
    for i in range(8):
        if i % 2 == 0:
            payload = mm.fake_image(i)
            px = np.frombuffer(payload[12:], dtype=np.uint8)
            assert got[i]["width"] == 8 and got[i]["height"] == 6
            assert got[i]["mean_value"] == pytest.approx(float(px.mean()))
        else:
            payload = mm.fake_audio(i)
            s = np.frombuffer(payload[12:], dtype=np.uint8)
            assert got[i]["n_samples"] == 64
            assert got[i]["mean_value"] == pytest.approx(float(s.mean()))
        assert got[i]["n_bytes"] == len(payload)


def test_unknown_magic_raises(spark):
    rows = [(0, "image", b"\x89PNG\r\n\x1a\nrealpngbytes", ("x", None))]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        mm.extract_features(df).collect()


def test_decode_one_stub_direct():
    with pytest.raises(NotImplementedError):
        mm._decode_one("video", b"REALMP4\x00data")


def test_bmp_decode_matches_handcrafted_spec_bytes():
    """Parser verified against hand-laid-out spec bytes, not our writer:
    2x2 24-bpp BMP, rows padded 6->8 bytes, bottom-up."""
    import struct

    from linkgraph.multimodal import _decode_bmp

    px_rows = [
        bytes([10, 20, 30, 40, 50, 60]) + b"\x00\x00",   # bottom row + pad
        bytes([70, 80, 90, 100, 110, 120]) + b"\x00\x00",
    ]
    pix = b"".join(px_rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pix), 0, 0, 0, 0)
    w, h, mean = _decode_bmp(header + dib + pix)
    assert (w, h) == (2, 2)
    assert mean == sum(range(10, 130, 10)) / 12  # padding excluded


def test_wav_decode_matches_handcrafted_spec_bytes():
    import struct

    from linkgraph.multimodal import _decode_wav

    samples = struct.pack("<4h", -100, 100, 300, -300)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(samples)) + samples)
    n, mean = _decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (n, mean) == (4, 0.0)


def test_real_codecs_through_spark_batch_path(spark):
    """Real BMP/WAV payloads decode through the same mapInPandas stage as
    the fake formats, mixed in one batch."""
    import numpy as np

    from linkgraph.multimodal import (
        extract_features,
        fake_image,
        make_bmp,
        make_wav,
    )

    rows = [
        (0, "image", bytearray(make_bmp(1, w=5, h=3))),
        (1, "audio", bytearray(make_wav(2, n=16))),
        (2, "image", bytearray(fake_image(3))),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r for r in extract_features(media).collect()}
    assert (got[0]["width"], got[0]["height"]) == (5, 3)
    # independent mean: reuse the generator's rng stream
    rng = np.random.default_rng(1)
    stride = (5 * 3 + 3) & ~3
    px = rng.integers(0, 256, size=(3, 5 * 3), dtype=np.uint16).astype(np.uint8)
    assert abs(got[0]["mean_value"] - px.mean()) < 1e-9
    assert got[1]["n_samples"] == 16
    rng = np.random.default_rng(2)
    s = rng.integers(-32768, 32768, size=16, dtype=np.int64).astype("<i2")
    assert abs(got[1]["mean_value"] - s.mean()) < 1e-9
    assert got[2]["width"] == 8  # fake path still vectorized alongside


def test_transform_resize_and_frame_sample(spark):
    """Nearest-neighbor resize / frame sampling vs a direct numpy replica
    on spec-valid generated payloads (odd grids exercise the floor
    index math)."""
    import numpy as np

    from linkgraph.multimodal import (
        _bmp_pixels, _wav_samples, make_bmp, make_wav, transform_features,
    )

    rows = [
        (0, "image", bytearray(make_bmp(7, w=5, h=3))),
        (1, "audio", bytearray(make_wav(8, n=17))),
        (2, "image", bytearray(make_bmp(9, w=6, h=4))),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        r["media_id"]: r
        for r in transform_features(df, img_grid=(2, 3), audio_stride=4).collect()
    }
    for mid, kind, payload in rows:
        payload = bytes(payload)
        if kind == "image":
            pix = _bmp_pixels(payload).astype(np.int64)
            h, w = pix.shape[0], pix.shape[1]
            sy = (np.arange(2) * h) // 2
            sx = (np.arange(3) * w) // 3
            rs = pix[sy][:, sx, :]
            assert got[mid]["n_units"] == rs.size
            assert got[mid]["checksum"] == int(rs.sum())
            assert abs(got[mid]["mean6"] - rs.mean()) < 1e-5
        else:
            sub = _wav_samples(payload)[::4].astype(np.int64)
            assert got[mid]["n_units"] == len(sub)
            assert got[mid]["checksum"] == int(np.abs(sub).sum())
            assert abs(got[mid]["mean6"] - sub.mean()) < 1e-5
