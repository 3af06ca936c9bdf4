"""Multimodal (binary-column) operator plumbing.

Image/audio/video payloads ride as opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas UDF stages (the only sane shape for per-byte media
work on Spark).  The actual codecs (PIL/ffmpeg/torchaudio) are NOT in
this container, so the decode step is STUBBED — ``real=True`` raises
``NotImplementedError`` at the exact integration point, and the default
produces a deterministic md5-derived fake feature vector so the
Spark-side plumbing (schema, batching, partitioning, UDF signature) is
fully real and testable end-to-end.

Media table schema::

    media_ref   string      (join key; see pipeline.resolve_media_refs)
    media_kind  string      image | audio | video
    payload     binary      opaque encoded bytes
    width       int         (images/video; nullable)
    height      int
    duration_ms int         (audio/video; nullable)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_kind", StringType(), True),
        StructField("checksum", StringType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)


def _fake_features(payload: bytes, n_features: int) -> tuple[str, list[float]]:
    """Deterministic stand-in for a real decoder: md5 of the payload,
    expanded into n unit-interval features (4 hex chars each, cycling)."""
    digest = hashlib.md5(payload).hexdigest()
    feats = []
    for i in range(n_features):
        chunk = digest[(i * 4) % 32 : (i * 4) % 32 + 4]
        feats.append(round(int(chunk, 16) / 65535.0, 6))
    return digest, feats


def extract_media_features(
    df: DataFrame, n_features: int = 8, real: bool = False
) -> DataFrame:
    """Feature extraction over binary payloads (mapInPandas stage).

    ``real=True`` marks where an actual decoder plugs in (PIL for
    image, soundfile for audio, pyav frame grab for video) — not
    available in this container, so it raises."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg; not in container "
                "(stubbed per round-1 brief)"
            )
        for pdf in it:
            checksums = []
            feats = []
            for payload in pdf["payload"]:
                digest, f = _fake_features(bytes(payload), n_features)
                checksums.append(digest)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf.get(
                        "media_kind", pd.Series([None] * len(pdf))
                    ),
                    "checksum": checksums,
                    "features": feats,
                }
            )

    cols = ["media_ref", "payload"] + (
        ["media_kind"] if "media_kind" in df.columns else []
    )
    return df.select(*cols).mapInPandas(batches, FEATURE_SCHEMA)


def resize_dims(df: DataFrame, max_dim: int = 512) -> DataFrame:
    """Resize planning: target dimensions preserving aspect ratio.
    Pure JVM arithmetic (no UDF) — the byte-level resample would slot
    into the decode stub above."""
    scale = F.when(
        F.greatest("width", "height") > max_dim,
        max_dim / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    return df.withColumn(
        "target_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn(
        "target_height", F.ceil(F.col("height") * scale).cast("int")
    )


def frame_sample_refs(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling plan: n evenly-spaced frame refs per video
    row, JVM-side (explode over a sequence; the actual frame decode is
    the stub above).  Output: (media_ref, frame_idx, frame_ms,
    frame_ref)."""
    vids = df.where(F.col("media_kind") == "video")
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias(
        "frame_idx"
    )
    out = vids.select("media_ref", "duration_ms", idx)
    # integer DIV, not float division: float-cast truncation rules
    # differ between engines (Spark truncates, DuckDB rounds)
    frame_ms = F.expr(
        f"CAST((duration_ms * (2 * frame_idx + 1)) DIV {2 * n_frames} "
        "AS BIGINT)"
    )
    return out.select(
        "media_ref",
        "frame_idx",
        frame_ms.alias("frame_ms"),
        F.concat(
            F.col("media_ref"), F.lit("#f"), F.col("frame_idx")
        ).alias("frame_ref"),
    )
