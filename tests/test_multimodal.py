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
