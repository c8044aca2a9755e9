"""Multimodal (image/audio/video) column plumbing (north-star extension).

Media are opaque ``binary`` payloads with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages. The image/audio codec libraries are NOT in this container, so the
codec call itself is stubbed: with ``fake=True`` (default) each stage emits
a DETERMINISTIC fake derived from md5(payload) — schema, partitioning, UDF
signature and batch shape are all real and tested; with ``fake=False`` the
stage raises NotImplementedError at the exact point a codec (PIL/ffmpeg/
torchaudio) would be invoked.

Scale design: payloads never leave the executor (mapInPandas streams Arrow
record batches); feature vectors are fixed-width ``array<float>`` so the
downstream similarity/dedup operators (operators/similarity.py) apply
unchanged; frame sampling explodes rows executor-side with bounded
amplification (frames_per_doc ≤ duration/interval).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal column convention
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("meta", StringType(), True),  # JSON sidecar metadata
    ]
)


def _fake_floats(payload: bytes, n: int, salt: str) -> np.ndarray:
    """Deterministic stand-in for a decoded feature vector: md5-seeded
    uniform floats in [0,1). Stable across processes and engines."""
    seed = int.from_bytes(
        hashlib.md5(salt.encode() + (payload or b"")).digest()[:8], "big"
    )
    rng = np.random.default_rng(seed)
    return rng.random(n, dtype=np.float64).astype(np.float32)


def attach_media(df: DataFrame, id_col: str, bytes_col: str, mime: str) -> DataFrame:
    """Normalize any (id, binary) pair onto the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(bytes_col).cast("binary").alias("payload"),
        F.lit(mime).alias("mime"),
        F.to_json(
            F.struct(F.length(F.col(bytes_col)).alias("n_bytes"))
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, dims: int = 64, fake: bool = True
) -> DataFrame:
    """Decode + feature-extract: (media_id, embedding array<float>, n_bytes).

    Real path would decode the payload (PIL/librosa) and run an encoder;
    stubbed per module docstring. Output is directly consumable by
    cosine_topk / neardup_pairs_cosine.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError(
                    "media codec not available in this environment: "
                    "plug PIL/librosa decode here"
                )
            feats = [
                _fake_floats(p, dims, "feat") for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "embedding": feats,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(
        run, "media_id long, embedding array<float>, n_bytes long"
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """Byte-level metadata extraction: (media_id, n_bytes, payload_md5).

    Unlike the codec stages this one needs NO external library — byte
    length and content hash are real, so this stage runs genuinely
    end-to-end and (because md5-of-utf8-bytes is SQL-expressible in both
    engines) anchors the multimodal mapInPandas plumbing inside the
    hash-checked oracle gate, not just the rows-only check.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [p or b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "payload_md5": [
                        hashlib.md5(p).hexdigest() for p in payloads
                    ],
                }
            )

    return media.mapInPandas(
        run, "media_id long, n_bytes long, payload_md5 string"
    )


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, fake: bool = True
) -> DataFrame:
    """Resize: emits a new payload of deterministic size (w*h bytes in the
    fake path; re-encoded image bytes in a real deployment)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError("plug PIL Image.resize here")
            out = [
                (_fake_floats(p, width * height, "resize") * 255)
                .astype(np.uint8)
                .tobytes()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "mime": pdf["mime"],
                    "meta": pdf["meta"],
                }
            )

    return media.mapInPandas(
        run, "media_id long, payload binary, mime string, meta string"
    )


def sample_frames(
    media: DataFrame,
    interval_ms: int = 1000,
    duration_ms: int = 5000,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling: one row per sampled frame (bounded row amplification,
    duration/interval frames per media). Real path = ffmpeg seek+decode."""
    n_frames = max(1, duration_ms // interval_ms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError("plug ffmpeg frame extraction here")
            ids, frame_idx, ts, frames = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for i in range(n_frames):
                    ids.append(mid)
                    frame_idx.append(i)
                    ts.append(i * interval_ms)
                    frames.append(
                        (_fake_floats(p, 16, f"frame{i}") * 255)
                        .astype(np.uint8)
                        .tobytes()
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": frame_idx,
                    "ts_ms": ts,
                    "frame": frames,
                }
            )

    return media.mapInPandas(
        run, "media_id long, frame_idx int, ts_ms long, frame binary"
    )
