"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the codec step itself is STUBBED (the
sandbox has no image/audio libraries): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic fake
decoder produces stable per-payload features so the distributed plumbing can
be exercised end-to-end.

Scale notes: binary payloads dominate row size, so the operators here
aggressively column-prune before the Python stage, bound Arrow batch bytes
(maxRecordsPerBatch in session.py), and emit fixed-size feature vectors so
downstream joins/aggs never carry the blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_id long, kind string, n_bytes long, sha256 string, magic string"
)
IMAGE_FEATURES_DDL = (
    "media_id long, width int, height int, channels int, mean_luma double, "
    "feature array<float>, error string"
)
FRAME_SAMPLE_DDL = "media_id long, frame_idx int, frame_sha256 string"

_MAGIC = {
    b"\x89PNG": "png", b"\xff\xd8\xff": "jpeg", b"GIF8": "gif",
    b"RIFF": "riff", b"\x00\x00\x00": "mp4ish", b"ID3": "mp3", b"OggS": "ogg",
    b"%PDF": "pdf",
}


def sniff_magic(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for prefix, name in _MAGIC.items():
        if payload[: len(prefix)] == prefix:
            return name
    return "unknown"


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """STUB: real decode needs an image library not present in this
    container. The fake path derives deterministic pseudo-features from the
    payload hash so tests exercise the full distributed path."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (Pillow/opencv); "
            "not available in this environment — pass fake=True for the "
            "deterministic test decoder"
        )
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
    feature = (rng[:16] / 255.0).astype(np.float32)
    return {
        "width": int(width), "height": int(height), "channels": 3,
        "mean_luma": float(rng.mean() / 255.0), "feature": feature.tolist(),
    }


def media_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Typed metadata WITHOUT touching Python: size, hash, magic-sniff are
    all JVM expressions, so this runs at scan speed and the blobs never
    cross the Arrow boundary."""
    p = F.col(payload_col)
    magic = (
        F.when(p.isNull() | (F.octet_length(p) == 0), F.lit("empty"))
        .when(F.startswith(p, F.lit(b"\x89PNG")), F.lit("png"))
        .when(F.startswith(p, F.lit(b"\xff\xd8\xff")), F.lit("jpeg"))
        .when(F.startswith(p, F.lit(b"GIF8")), F.lit("gif"))
        .when(F.startswith(p, F.lit(b"RIFF")), F.lit("riff"))
        .when(F.startswith(p, F.lit(b"ID3")), F.lit("mp3"))
        .when(F.startswith(p, F.lit(b"OggS")), F.lit("ogg"))
        .when(F.startswith(p, F.lit(b"%PDF")), F.lit("pdf"))
        .otherwise(F.lit("unknown"))
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        magic.alias("magic"),
        F.octet_length(p).cast("long").alias("n_bytes"),
        F.sha2(F.coalesce(p, F.lit(b"")), 256).alias("sha256"),
    )


def image_features(df: DataFrame, id_col: str, payload_col: str, fake: bool = True) -> DataFrame:
    """decode/feature-extract via mapInPandas: blobs in, fixed-size features
    out. Column-prunes to (id, payload) before the Python boundary; per-row
    failures land in `error` (the engine's row-level error channel)."""
    narrow = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"].values, "width": [], "height": [],
                   "channels": [], "mean_luma": [], "feature": [], "error": []}
            for payload in pdf["payload"]:
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    d = decode_image(bytes(payload), fake=fake)
                    out["width"].append(d["width"]); out["height"].append(d["height"])
                    out["channels"].append(d["channels"]); out["mean_luma"].append(d["mean_luma"])
                    out["feature"].append(d["feature"]); out["error"].append(None)
                except Exception as e:
                    out["width"].append(None); out["height"].append(None)
                    out["channels"].append(None); out["mean_luma"].append(None)
                    out["feature"].append(None); out["error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return narrow.mapInPandas(kernel, schema=IMAGE_FEATURES_DDL)


def sample_frames(df: DataFrame, id_col: str, payload_col: str, every_n_bytes: int = 4096,
                  max_frames: int = 8) -> DataFrame:
    """Video frame-sample analog: slice the payload at fixed offsets ("key
    frames") and hash each slice — real video decode is stubbed, but the
    fan-out shape (1 row -> N frame rows, explode after mapInPandas) is the
    production shape."""
    narrow = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                for fi in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    chunk = data[fi * every_n_bytes : (fi + 1) * every_n_bytes]
                    ids.append(mid); idxs.append(fi)
                    hashes.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_sha256": hashes})

    return narrow.mapInPandas(kernel, schema=FRAME_SAMPLE_DDL)
