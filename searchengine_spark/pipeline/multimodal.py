"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns
with structured metadata; decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes never round-trip through the
driver and each task decodes only its partition.

The decode kernels themselves need codec libraries that are NOT in
this container, so they are stubbed two ways:

- ``decode_stub=True`` (default): a deterministic fake "decode" (md5 of
  the bytes -> pseudo dimensions / features) so the full Spark plumbing
  (schema, batching, partitioning, UDF signatures) is real and tested;
- ``decode_stub=False``: raises ``NotImplementedError`` at the point a
  real decoder (PIL / ffmpeg / torchaudio) would be plugged in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, n_bytes long"
)
FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    f"feature array<float>"
)


def make_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads)."""
    kinds = ["image", "audio", "video"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng((seed << 32) + i)
                kind = kinds[i % 3]
                payload = rng.integers(0, 256, size=64 + i % 512, dtype=np.uint8).tobytes()
                mime = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
                rows.append((i, kind, payload, mime, len(payload)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "mime", "n_bytes"]
            )

    return spark.range(0, n, 1, max(2, n // 1000 + 1)).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str):
    """Deterministic stand-in for a real decoder."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0]
    height = 16 + h[1]
    n_frames = 1 if kind == "image" else 1 + h[2] % 32
    feat = np.frombuffer(hashlib.md5(b"f" + payload).digest(), dtype=np.uint8)
    feat = (feat.astype(np.float32) / 255.0)[:FEATURE_DIM]
    return width, height, n_frames, feat


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + featurize media partitions via mapInPandas.

    Real pipeline point: swap ``_fake_decode`` for PIL/ffmpeg decode +
    a model forward pass per Arrow batch. Everything around it (schema,
    batch shape, partition-local execution) is production-shaped.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not available "
                    "in this environment; use decode_stub=True"
                )
            out = {"media_id": [], "kind": [], "width": [], "height": [],
                   "n_frames": [], "feature": []}
            for _, row in pdf.iterrows():
                w, h, nf, feat = _fake_decode(bytes(row["payload"]), row["kind"])
                out["media_id"].append(row["media_id"])
                out["kind"].append(row["kind"])
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURES_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning: target dims per item (pure column math; the
    pixel work would live in the same mapInPandas as decode)."""
    feats = extract_features(media)
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")),
    )
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plan for videos: (media_id, frame_index) rows."""
    feats = extract_features(media).where(F.col("kind") == "video")
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_index"),
    )
