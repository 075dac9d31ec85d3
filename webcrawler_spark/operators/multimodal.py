"""Multimodal column plumbing: image/audio/video as opaque binary.

A web-scale training pipeline carries media as ``binary`` columns with
typed metadata, decoded lazily inside Arrow-batched ``mapInPandas``
stages. The *Spark-side* machinery here — schemas, batch iteration,
partition sizing, deterministic fakes for tests — is real and tested;
the actual codec calls are stubbed behind ``NotImplementedError``
because no image/audio libraries exist in this sandbox (plug Pillow /
torchaudio / PyAV into ``_decode_image_real`` etc. in production).

Design points that matter at 100 TB:
* media rows are wide → ``media_repartition_by_size`` packs partitions
  by cumulative byte size, not row count, so one 4K-video row cannot
  blow an executor while thumbnail rows leave others idle.
* decode/feature stages are ``mapInPandas`` (streaming batches, bounded
  memory) rather than a scalar UDF holding the whole column batch.
* features come back as fixed-size array<float> columns that feed the
  similarity operators directly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string,"
    " width int, height int, duration_s double"
)

IMAGE_FEATURE_DIM = 16


def _decode_image_real(content: bytes) -> "np.ndarray":
    """Plug point for a real decoder (Pillow/opencv). Not available here."""
    raise NotImplementedError(
        "image codec not available in this environment; use fake=True"
    )


def _fake_feature(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: bytes of blake2b digest → [0,1)."""
    d = hashlib.blake2b(content or b"", digest_size=dim).digest()
    return np.frombuffer(d, dtype=np.uint8).astype(np.float64) / 256.0


def image_features(
    media: DataFrame, fake: bool = False, dim: int = IMAGE_FEATURE_DIM
) -> DataFrame:
    """(media_id, feature array<double>) via mapInPandas batches.

    With ``fake=True`` the decode is a deterministic digest-based
    vector (schema/partitioning/batching all real); with ``fake=False``
    it raises until a codec is plugged in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                if fake:
                    feats.append(_fake_feature(bytes(content or b""), dim).tolist())
                else:
                    _decode_image_real(bytes(content or b""))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return media.select("media_id", "content").mapInPandas(
        run, "media_id long, feature array<double>"
    )


def frame_sample_plan(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video → one row per planned sample frame (timestamps only; the
    actual frame extraction is the stubbed decode). Native explode of a
    generated sequence — the fan-out shape a real sampler needs."""
    n = F.greatest(
        (F.col("duration_s") / F.lit(every_s)).cast("int"), F.lit(1)
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n - 1), lambda i: i * F.lit(every_s)
            )
        ).alias("sample_ts"),
    )


def media_repartition_by_size(
    media: DataFrame, target_bytes: int = 128 << 20
) -> DataFrame:
    """Repartition so each partition holds ~target_bytes of payload.

    Row-count partitioning fails for media (bytes per row varies by
    10^4×); this packs by size using a deterministic hash order.
    """
    total = media.select(
        F.sum(F.length("content")).alias("b")
    ).first()["b"] or 0
    n_parts = max(1, int(total / target_bytes) + 1)
    return media.repartition(n_parts, F.xxhash64("media_id"))


def build_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (no codecs)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, F.lit("image"))
        .when(F.col("id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(
            F.concat(F.lit("media-payload-"), F.col("id").cast("string")), "utf-8"
        ).alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("id") % 640).cast("int").alias("width"),
        (F.col("id") % 480).cast("int").alias("height"),
        (F.col("id") % 30).cast("double").alias("duration_s"),
    )
