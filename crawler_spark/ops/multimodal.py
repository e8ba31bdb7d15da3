"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side machinery is REAL and tested: typed schema, host-hash
partitioning, Arrow-batched mapInPandas with bounded batch sizes, and
deterministic synthetic payloads. All three decode paths are REAL
pure-numpy codecs for the uncompressed public container layouts —
24-bit BMP images, PCM-16 RIFF/WAVE audio, and raw-DIB RIFF/AVI video
— registered in `DECODERS`; compressed streams (JPEG/MP3/H.264 etc.)
raise the explicit NotImplementedError guard, and a real deployment
swaps in a codec of the same signature (bytes -> np.ndarray) without
touching the Spark plumbing.

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


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(N, H, W, 3) uint8 RGB -> uncompressed RIFF/AVI bytes: a 'vids'
    stream with handler 'DIB ' whose '00db' chunks are raw bottom-up
    BGR frames with rows padded to 4 bytes (the same public layout a
    BMP body uses), plus a standard idx1 index. Layouts are public
    (RIFF AVI; MainAVIHeader/AVIStreamHeader/BITMAPINFOHEADER)."""
    import struct

    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3:
        raise ValueError("encode_avi expects (N, H, W, 3) uint8")
    n, h, w, _ = fr.shape
    row_len = (w * 3 + 3) & ~3
    body = np.zeros((n, h, row_len), dtype=np.uint8)
    # RGB -> BGR, top row last (bottom-up), per frame
    body[:, :, : w * 3] = fr[:, ::-1, :, ::-1].reshape(n, h, w * 3)
    frame_size = h * row_len

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return struct.pack("<4sI", cid, len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    usec = 1_000_000 // fps
    avih = chunk(
        b"avih",
        struct.pack(
            "<14I", usec, frame_size * fps, 0, 0x10, n, 0, 1,
            frame_size, w, h, 0, 0, 0, 0,
        ),
    )
    strh = chunk(
        b"strh",
        struct.pack(
            "<4s4sIHHIIIIIIII4h", b"vids", b"DIB ", 0, 0, 0, 0,
            1, fps, 0, n, frame_size, 0xFFFFFFFF, 0, 0, 0, w, h,
        ),
    )
    strf = chunk(
        b"strf",
        struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size,
            2835, 2835, 0, 0,
        ),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi_chunks, idx, off = [], [], 4  # first ckid at +4 from 'movi'
    for i in range(n):
        data = body[i].tobytes()
        movi_chunks.append(chunk(b"00db", data))
        idx.append(struct.pack("<4sIII", b"00db", 0x10, off, len(data)))
        off += 8 + len(data) + (len(data) & 1)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx))
    inner = hdrl + movi + idx1
    return struct.pack("<4sI4s", b"RIFF", 4 + len(inner), b"AVI ") + inner


def decode_avi(payload: bytes) -> np.ndarray:
    """Uncompressed raw-DIB RIFF/AVI -> (N, H, W, 3) float64 RGB in
    [0, 255]. Walks the chunk tree (header dims from avih, compression
    guard from strf, frames from the movi '00db' chunks — idx1 is not
    required); compressed streams raise the explicit guard."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    info: dict = {}
    frames: list = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", payload, pos)
            data = pos + 8
            if cid == b"LIST":
                walk(data + 4, data + size)
            elif cid == b"avih":
                vals = struct.unpack_from("<14I", payload, data)
                info["usec"], info["w"], info["h"] = (
                    vals[0], vals[8], vals[9],
                )
            elif cid == b"strf":
                _, _, _, _, bpp, comp = struct.unpack_from(
                    "<IiiHHI", payload, data
                )
                if bpp != 24 or comp != 0:
                    raise NotImplementedError(
                        f"only 24-bit uncompressed (BI_RGB) AVI video "
                        f"supported (bpp={bpp}, compression={comp})"
                    )
            elif cid == b"00dc":
                raise NotImplementedError(
                    "compressed AVI frame chunks ('00dc') are not "
                    "supported; only raw-DIB '00db' streams"
                )
            elif cid == b"00db":
                frames.append((data, size))
            pos = data + size + (size & 1)

    walk(12, len(payload))
    if "w" not in info:
        raise ValueError("AVI missing avih header chunk")
    w, h = info["w"], info["h"]
    row_len = (w * 3 + 3) & ~3
    out = np.empty((len(frames), h, w, 3), dtype=np.float64)
    for i, (off, size) in enumerate(frames):
        if size < h * row_len:
            raise ValueError("truncated AVI frame chunk")
        body = np.frombuffer(
            payload, dtype=np.uint8, count=h * row_len, offset=off
        ).reshape(h, row_len)
        out[i] = body[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
    return out


def avi_frame_at(payload: bytes, ts_ms: int) -> tuple[int, np.ndarray]:
    """(frame_idx, (H, W, 3) float64 RGB) for the frame covering
    ts_ms, clamped to the last frame — the decode half of the
    frame_sample plan. Decodes the container once per call; callers
    sampling many timestamps should decode_avi once and index."""
    import struct

    # dwMicroSecPerFrame is the first field of the avih chunk's data;
    # hdrl precedes movi so the first 'avih' occurrence is the header
    usec = struct.unpack_from("<I", payload, payload.index(b"avih") + 8)[0]
    frames = decode_avi(payload)
    idx = min(int(ts_ms * 1000 // max(usec, 1)), len(frames) - 1)
    return idx, frames[idx]


# decode registry: kind -> bytes -> ndarray. All three kinds decode
# REAL payloads end-to-end (24-bit BMP, PCM-16 WAV, raw-DIB AVI);
# compressed formats raise the explicit NotImplementedError guards,
# and a deployment swaps richer codecs in here.
DECODERS = {
    "image": decode_bmp,
    "audio": decode_wav,
    "video": decode_avi,
}


def synth_media(
    spark: SparkSession, n: int, seed: int = 42, partitions: int = 4
) -> DataFrame:
    """Deterministic synthetic media table. Image payloads are VALID
    24-bit BMPs, audio payloads VALID PCM-16 WAVs, and video payloads
    VALID raw-DIB AVIs (counter-RNG content) — every decode path is
    exercised end-to-end on real container bytes."""

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
                    fps = 10
                    nf = 2 + int(rng.randint(5, seed, i, 77))
                    w = int(4 + rng.randint(9, seed, i, 74))
                    h = int(4 + rng.randint(9, seed, i, 75))
                    px = (
                        rng.hash64(seed, i, np.arange(nf * h * w * 3), 73)
                        % 256
                    ).astype(np.uint8).reshape(nf, h, w, 3)
                    payload = encode_avi(px, fps=fps)
                    duration = nf * 1000 // fps
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "width": w,
                        "height": h,
                        "duration_ms": duration,
                        "codec": {"image": "bmp", "audio": "pcm_s16le",
                                  "video": "rawvideo"}[kind],
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


FRAME_SAMPLES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("src_frame", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("f_mean", DoubleType(), False),
        StructField("f_std", DoubleType(), False),
    ]
)


def decode_sampled_frames(
    media: DataFrame,
    every_ms: int = 10000,
    max_frames: int = 8,
    batch_rows: int = 64,
) -> DataFrame:
    """The decode half of `frame_sample`: for each video, decode the
    AVI container ONCE and emit one row per sampled timestamp —
    (frame_idx, ts_ms) exactly as frame_sample schedules them (gated
    by set equality in tests), plus the container frame actually
    served (src_frame = the frame covering ts_ms per the stream
    clock, clamped to the last frame) and its pixel summary.

    One pass over the payload column, no join back to the plan (a
    plan-side join would ship each payload once per sampled frame);
    bounded Arrow batches like extract_features since payloads are
    the wide column."""

    def run(batches):
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out: dict = {k.name: [] for k in FRAME_SAMPLES.fields}
                for mid, payload, dur in zip(
                    chunk["media_id"], chunk["payload"], chunk["duration_ms"]
                ):
                    b = bytes(payload)
                    frames = decode_avi(b)
                    i = b.index(b"avih") + 8
                    usec = int.from_bytes(b[i : i + 4], "little")
                    nf = min(max(int(dur) // every_ms, 1), max_frames)
                    for j in range(nf):
                        ts = j * every_ms
                        src = min(
                            int(ts * 1000 // max(usec, 1)), len(frames) - 1
                        )
                        f = frames[src]
                        out["media_id"].append(int(mid))
                        out["frame_idx"].append(j)
                        out["ts_ms"].append(ts)
                        out["src_frame"].append(src)
                        out["height"].append(f.shape[0])
                        out["width"].append(f.shape[1])
                        out["f_mean"].append(float(f.mean()))
                        out["f_std"].append(float(f.std()))
                yield pd.DataFrame(out)

    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    )
    return vids.mapInPandas(run, schema=FRAME_SAMPLES)


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
