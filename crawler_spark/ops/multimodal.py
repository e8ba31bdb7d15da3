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
    """Deterministic fake decoder: bytes -> pseudo-pixel array. Real
    codecs are unavailable here (no PIL/ffmpeg in the container);
    swap this for a true decode at deployment."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr.astype(np.float64)


def _decode_unavailable(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real image/audio/video codecs are not installed in this "
        "environment; register one in DECODERS"
    )


# decode registry: kind -> bytes -> ndarray
DECODERS = {
    "image": _decode_stub,
    "audio": _decode_stub,
    "video": _decode_stub,
}


def synth_media(
    spark: SparkSession, n: int, seed: int = 42, partitions: int = 4
) -> DataFrame:
    """Deterministic synthetic media table (counter-RNG payloads)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            kinds = np.array(["image", "audio", "video"])[
                rng.randint(3, seed, ids, 71)
            ]
            rows = []
            for i, kind in zip(ids.tolist(), kinds.tolist()):
                ln = 64 + int(rng.randint(192, seed, i, 72))
                payload = (
                    rng.hash64(seed, i, np.arange((ln + 7) // 8), 73)
                    .astype(">u8")
                    .tobytes()[:ln]
                )
                w = int(16 + rng.randint(112, seed, i, 74))
                h = int(16 + rng.randint(112, seed, i, 75))
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "width": w if kind == "image" else None,
                        "height": h if kind == "image" else None,
                        "duration_ms": int(rng.randint(60000, seed, i, 76))
                        if kind != "image"
                        else None,
                        "codec": {"image": "fake-png", "audio": "fake-wav",
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
        buf: list[pd.DataFrame] = []
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = []
                for payload, kind in zip(chunk["payload"], chunk["kind"]):
                    arr = DECODERS[kind](bytes(payload))
                    qs = np.quantile(arr, [0.1, 0.25, 0.5, 0.75, 0.9])
                    f = np.concatenate(
                        [[arr.mean(), arr.std(), float(len(arr))], qs]
                    )
                    f = np.pad(f, (0, max(0, feat_dim - len(f))))[:feat_dim]
                    feats.append(f.tolist())
                buf.append(
                    pd.DataFrame(
                        {
                            "media_id": chunk["media_id"].to_numpy(np.int64),
                            "kind": chunk["kind"].to_numpy(),
                            "feature": feats,
                        }
                    )
                )
        yield from buf

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
    return imgs.select(
        "media_id",
        "width",
        "height",
        F.round(F.lit(target) / F.col("width"), 6).alias("scale_x"),
        F.round(F.lit(target) / F.col("height"), 6).alias("scale_y"),
    )
