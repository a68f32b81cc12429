"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not in this container, so the decode
kernels are STUBBED (deterministic fake or NotImplementedError) — but the
Spark-side plumbing is real and tested: schemas, Arrow batch shape,
``mapInPandas`` signatures, partition sizing.  Swapping the stub for a real
``PIL.Image.open`` / ``soundfile.read`` keeps every plan unchanged.

Pattern: binary columns never pass through Python row-at-a-time; they cross
in Arrow record batches via ``mapInPandas`` (streaming batches, bounded
memory) — the correct shape for TB-scale media columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta_width int, meta_height int, meta_duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, digest string, "
    "feat array<float>"
)


def make_media_table(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    df = spark.range(0, n, 1, partitions).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        (F.pmod(F.col("id"), F.lit(64)) * 16 + 16).cast("int").alias("meta_width"),
        (F.pmod(F.col("id"), F.lit(48)) * 16 + 16).cast("int").alias("meta_height"),
        (F.pmod(F.col("id"), F.lit(1000)) * 40).cast("int").alias("meta_duration_ms"),
    )
    return df


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB decode/feature kernel.

    Real implementation would be e.g. PIL/torchvision (image), librosa
    (audio), pyav frame sampling (video) — none installed here.  The stub is
    a deterministic 8-dim feature from the payload digest so tests can assert
    end-to-end plumbing (stable values, right shapes) without media libs.
    """
    h = hashlib.sha256(payload + kind.encode()).digest()
    return [b / 255.0 for b in h[:8]]


def decode_unavailable(*_args, **_kw):
    """The honest non-stub entry point."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/av which are not installed; "
        "use the deterministic stub (extract_features) for plumbing tests"
    )


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """``mapInPandas`` feature extraction over binary payloads.

    Arrow streams record batches into Python; each batch is processed as a
    pandas DataFrame (vectorized where the kernel allows).  Output schema is
    fixed (FEATURE_SCHEMA) so downstream plans are stable regardless of the
    kernel."""

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feat": feats,
                }
            )

    return df.mapInPandas(_fn, schema=FEATURE_SCHEMA)


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning stays JVM-side: compute target dims declaratively;
    only the (stubbed) pixel work would cross to Python."""
    scale = F.least(
        F.lit(max_side) / F.col("meta_width"), F.lit(max_side) / F.col("meta_height"),
        F.lit(1.0),
    )
    return df.withColumns(
        {
            "target_width": F.ceil(F.col("meta_width") * scale).cast("int"),
            "target_height": F.ceil(F.col("meta_height") * scale).cast("int"),
        }
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: explode target timestamps declaratively
    (one row per frame to decode); the decode itself is the stubbed kernel."""
    frames = F.when(
        F.col("kind") == "video",
        F.sequence(F.lit(0), F.greatest(F.col("meta_duration_ms") - 1, F.lit(0)), F.lit(every_ms)),
    ).otherwise(F.array(F.lit(0)))
    return df.withColumn("frame_ts_ms", F.explode(frames))
