"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side machinery is REAL and tested: typed schema, host-hash
partitioning, Arrow-batched mapInPandas with bounded batch sizes, and
deterministic synthetic payloads. The actual codecs (PIL/ffmpeg/...)
are not in this container, so the decode kernels are stubbed behind
`DECODERS` — a real deployment drops in a function of the same
signature (bytes -> np.ndarray) and nothing else changes.

Schema: (media_id, kind, payload: binary, meta: width/height/
duration_ms/codec) — metadata travels as typed columns so filters on
it (e.g. width >= 64) push down to the parquet scan without touching
payload bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import rng

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # 'image'|'audio'|'video'
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("codec", StringType()),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(DoubleType()), False),
    ]
)


def _decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake decoder: bytes -> pseudo-pixel array. Used
    ONLY for codecs this container genuinely lacks (video: no ffmpeg);
    swap for a true decode at deployment."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr.astype(np.float64)


def _decode_unavailable(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real image/audio/video codecs are not installed in this "
        "environment; register one in DECODERS"
    )


# ---- real, dependency-free codecs (pure numpy + struct) ----------
#
# BMP (24-bit uncompressed BI_RGB) and WAV (PCM 16-bit) are trivially
# parseable containers, so these two decode paths are REAL end-to-end:
# synth_media emits valid payloads, DECODERS parses them back, and the
# tests gate encode->decode round-trips bit-exactly. Format layouts
# are public (Windows BITMAPINFOHEADER; RIFF/WAVE PCM).


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes (bottom-up
    rows, BGR byte order, rows padded to 4 bytes — the standard
    layout)."""
    import struct

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w, _ = px.shape
    row_len = (w * 3 + 3) & ~3
    body = np.zeros((h, row_len), dtype=np.uint8)
    # RGB -> BGR, top row last (bottom-up)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    data = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) float64 RGB in [0, 255].
    Supports bottom-up (positive height, the common case) and
    top-down (negative height) row order."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    body = np.frombuffer(
        payload, dtype=np.uint8, count=h * row_len, offset=data_off
    ).reshape(h, row_len)
    px = body[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        px = px[::-1]
    return px.astype(np.float64)


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """int16 PCM samples (n,) or (n, channels) -> RIFF/WAVE bytes."""
    import struct

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 2:
        channels = s.shape[1]
    data = s.tobytes()
    block = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block, block, 16,
    )
    body = fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE PCM 16-bit -> float64 samples normalized to
    [-1, 1): (n,) mono or (n, channels). Walks the chunk list (fmt
    may be followed by LIST/fact before data)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, _rate, _brate, _block, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM 16-bit WAV supported (format={audio_format}, "
            f"bits={bits})"
        )
    s = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    return s.reshape(-1, channels) if channels > 1 else s


# decode registry: kind -> bytes -> ndarray. image (BMP) and audio
# (WAV/PCM) decode is REAL; video keeps the deterministic stub — the
# container genuinely lacks ffmpeg, and the stub is the documented
# deployment swap point.
DECODERS = {
    "image": decode_bmp,
    "audio": decode_wav,
    "video": _decode_stub,
}


def synth_media(
    spark: SparkSession, n: int, seed: int = 42, partitions: int = 4
) -> DataFrame:
    """Deterministic synthetic media table. Image payloads are VALID
    24-bit BMPs and audio payloads VALID PCM-16 WAVs (counter-RNG
    content — the real decode paths are exercised end-to-end); video
    payloads stay opaque deterministic bytes for the stubbed codec."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            kinds = np.array(["image", "audio", "video"])[
                rng.randint(3, seed, ids, 71)
            ]
            rows = []
            for i, kind in zip(ids.tolist(), kinds.tolist()):
                w = h = duration = None
                if kind == "image":
                    w = int(4 + rng.randint(13, seed, i, 74))
                    h = int(4 + rng.randint(13, seed, i, 75))
                    px = (
                        rng.hash64(seed, i, np.arange(h * w * 3), 73)
                        % 256
                    ).astype(np.uint8).reshape(h, w, 3)
                    payload = encode_bmp(px)
                elif kind == "audio":
                    ln = 64 + int(rng.randint(192, seed, i, 72))
                    samples = (
                        (rng.hash64(seed, i, np.arange(ln), 73) % 65536)
                        .astype(np.int64)
                        - 32768
                    ).astype(np.int16)
                    payload = encode_wav(samples, sample_rate=8000)
                    duration = int(round(ln * 1000 / 8000))
                else:
                    ln = 64 + int(rng.randint(192, seed, i, 72))
                    payload = (
                        rng.hash64(seed, i, np.arange((ln + 7) // 8), 73)
                        .astype(">u8")
                        .tobytes()[:ln]
                    )
                    duration = int(rng.randint(60000, seed, i, 76))
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "width": w,
                        "height": h,
                        "duration_ms": duration,
                        "codec": {"image": "bmp", "audio": "pcm_s16le",
                                  "video": "fake-h264"}[kind],
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA)


def extract_features(
    media: DataFrame, feat_dim: int = 8, batch_rows: int = 256
) -> DataFrame:
    """Decode + fixed-dim feature per item: mean/std/quantile summary
    of the decoded array, padded to feat_dim. mapInPandas with bounded
    batches (payloads are big: limit rows per Arrow batch, not bytes).
    """

    def run(batches):
        # yield per chunk: buffering every chunk until the end of the
        # partition would hold the whole partition's features in
        # worker memory, defeating the bounded-batch chunking and
        # blocking downstream pipelining
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = []
                for payload, kind in zip(chunk["payload"], chunk["kind"]):
                    arr = DECODERS[kind](bytes(payload))
                    qs = np.quantile(arr, [0.1, 0.25, 0.5, 0.75, 0.9])
                    f = np.concatenate(
                        [[arr.mean(), arr.std(), float(arr.size)], qs]
                    )
                    f = np.pad(f, (0, max(0, feat_dim - len(f))))[:feat_dim]
                    feats.append(f.tolist())
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(np.int64),
                        "kind": chunk["kind"].to_numpy(),
                        "feature": feats,
                    }
                )

    return media.mapInPandas(run, schema=FEATURES)


def frame_sample(
    media: DataFrame, every_ms: int = 10000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling plan: (media_id, frame_idx, ts_ms) rows —
    pure column math (sequence + explode); the decode of each frame
    goes through DECODERS downstream."""
    vids = media.filter(F.col("kind") == "video")
    n_frames = F.least(
        F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return vids.select(
        "media_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_idx", "ts_ms"),
    )


def resize_plan(media: DataFrame, target: int = 64) -> DataFrame:
    """Image resize metadata (scale factors) as column math; the pixel
    work itself is a DECODERS kernel at deployment."""
    imgs = media.filter(F.col("kind") == "image")
    # nullif: a malformed width/height of 0 yields a NULL scale for
    # that row — under ANSI (the session default) a bare division
    # would throw DIVIDE_BY_ZERO and kill the whole job for one bad
    # metadata record
    return imgs.select(
        "media_id",
        "width",
        "height",
        F.round(F.lit(target) / F.expr("nullif(width, 0)"), 6).alias("scale_x"),
        F.round(F.lit(target) / F.expr("nullif(height, 0)"), 6).alias("scale_y"),
    )
