"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` kernels. The actual codec step is STUBBED (no image/audio
libraries in this container): payloads carrying the deterministic
``FAKEIMG1``/``FAKEAUD1`` test headers decode via the fake parser below;
any other magic raises ``NotImplementedError`` — the Spark-side plumbing
(schema, partitioning, UDF signature, Arrow batch shape) is real and
tested, the codec is the single swap-in point.

Payload wire format (test fake):
    FAKEIMG1 | width:uint16be | height:uint16be | pixels (w*h bytes)
    FAKEAUD1 | n_samples:uint32be | samples (n bytes)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

IMG_MAGIC = b"FAKEIMG1"
AUD_MAGIC = b"FAKEAUD1"

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<source:string, ts:timestamp>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "n_samples int, mean_value double"
)


def payload_stats(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Pure-JVM metadata projection: -> (media_id, n_bytes, payload_md5)."""
    return media.select(
        F.col(id_col),
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def _decode_one(kind: str, payload: bytes) -> tuple[int, int, int, float]:
    """(width, height, n_samples, mean_value). STUB: fake codecs only.
    Kept as the single-row reference implementation + swap-in point for a
    real PIL/ffmpeg codec; the batch path below is pure numpy."""
    if payload[:8] == IMG_MAGIC:
        w = int.from_bytes(payload[8:10], "big")
        h = int.from_bytes(payload[10:12], "big")
        px = np.frombuffer(payload[12 : 12 + w * h], dtype=np.uint8)
        return w, h, 0, float(px.mean()) if px.size else 0.0
    if payload[:8] == AUD_MAGIC:
        n = int.from_bytes(payload[8:12], "big")
        samples = np.frombuffer(payload[12 : 12 + n], dtype=np.uint8)
        return 0, 0, n, float(samples.mean()) if samples.size else 0.0
    raise NotImplementedError(
        f"real {kind} codec not available in this environment; "
        "swap _decode_one for a PIL/ffmpeg-backed implementation"
    )


def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized batch decode: the whole Arrow batch's payloads are packed
    into ONE uint8 buffer; header fields come from strided gathers and the
    variable-length body sums from a single cumulative-sum + reduce-by-range
    — no per-row Python in the hot path (BASELINE.json input_hint)."""
    for pdf in batches:
        if not len(pdf):
            yield pd.DataFrame(
                columns=["media_id", "kind", "n_bytes", "width", "height",
                         "n_samples", "mean_value"]
            )
            continue
        payloads = [bytes(p) for p in pdf["payload"]]  # arrow buffers -> bytes
        lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                           count=len(payloads))
        buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        starts = off[:-1]

        # header gather: first 12 bytes of every payload as an (n, 12) view
        head = buf[starts[:, None] + np.arange(12)]
        is_img = (head[:, :8] == np.frombuffer(IMG_MAGIC, np.uint8)).all(axis=1)
        is_aud = (head[:, :8] == np.frombuffer(AUD_MAGIC, np.uint8)).all(axis=1)
        unknown = ~(is_img | is_aud)
        if unknown.any():
            kind = str(pdf["kind"].iloc[int(np.argmax(unknown))])
            raise NotImplementedError(
                f"real {kind} codec not available in this environment; "
                "swap the codec stage for a PIL/ffmpeg-backed implementation"
            )
        h16 = head.astype(np.int64)
        w = np.where(is_img, (h16[:, 8] << 8) | h16[:, 9], 0)
        h = np.where(is_img, (h16[:, 10] << 8) | h16[:, 11], 0)
        n_samp = np.where(
            is_aud,
            (h16[:, 8] << 24) | (h16[:, 9] << 16) | (h16[:, 10] << 8) | h16[:, 11],
            0,
        )

        # body means: one global cumsum, then sum over [body_start, body_end)
        csum = np.zeros(len(buf) + 1, dtype=np.int64)
        np.cumsum(buf, dtype=np.int64, out=csum[1:])
        body_start = starts + 12
        body_len = np.where(is_img, w * h, n_samp)
        body_end = np.minimum(body_start + body_len, off[1:])
        sums = csum[body_end] - csum[body_start]
        n_body = (body_end - body_start).clip(min=0)
        mean = np.where(n_body > 0, sums / np.maximum(n_body, 1), 0.0)

        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].astype("int64").to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "n_bytes": lens,
                "width": w.astype(np.int32),
                "height": h.astype(np.int32),
                "n_samples": n_samp.astype(np.int32),
                "mean_value": mean.astype(np.float64),
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode+featurize. Arrow batches bound peak memory per
    task (`spark.sql.execution.arrow.maxRecordsPerBatch`); at scale,
    repartition by media_id first so codec work spreads evenly."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        _extract_batch, FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# deterministic fake payload synthesis (tests / demo)
# ---------------------------------------------------------------------------

def fake_image(seed: int, w: int = 8, h: int = 6) -> bytes:
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h, dtype=np.uint16).astype(np.uint8)
    return IMG_MAGIC + w.to_bytes(2, "big") + h.to_bytes(2, "big") + px.tobytes()


def fake_audio(seed: int, n: int = 64) -> bytes:
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 256, size=n, dtype=np.uint16).astype(np.uint8)
    return AUD_MAGIC + n.to_bytes(4, "big") + s.tobytes()


def synth_media_df(spark, n: int = 20):
    from datetime import datetime, timedelta

    base = datetime(2025, 1, 1)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, "image", fake_image(i), ("synth", base + timedelta(seconds=i))))
        else:
            rows.append((i, "audio", fake_audio(i), ("synth", base + timedelta(seconds=i))))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
