"""Multimodal column plumbing: images / audio / video as opaque binary
columns with typed metadata.

The Spark-side design is real and tested — schemas, Arrow-batched UDF
signatures, partitioning by (modality, shard) — while the codec step is
pluggable: this container ships no image/audio libraries, so the default
codec is a clearly-marked deterministic fake (shape-correct, content-fake);
swap ``DECODERS[modality]`` for a real Pillow/torchaudio/pyav decoder on a
cluster that has them.

Scale notes: binary payloads dominate bytes — never shuffle them. All
per-asset work (decode, feature-extract, resize, frame-sample) happens in one
``mapInPandas`` pass over the storage partitioning; only small feature
vectors / metadata leave the stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, modality string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURES_SCHEMA = (
    "asset_id long, modality string, feat array<float>, n_frames int, ok boolean"
)


def synth_assets(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic fake asset table (payload = seeded bytes)."""
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")
    )
    mime = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("asset-payload-"), F.md5(F.encode(F.col("id").cast("string"), "UTF-8"))),
        "UTF-8",
    )
    return base.select(
        F.col("id").alias("asset_id"),
        modality.alias("modality"),
        mime.alias("mime"),
        ((F.col("id") % 64) * 16 + 16).cast("int").alias("width"),
        ((F.col("id") % 48) * 16 + 16).cast("int").alias("height"),
        ((F.col("id") % 300) * 100).cast("int").alias("duration_ms"),
        payload.alias("payload"),
    )


def _fake_decode(payload: bytes, modality: str) -> np.ndarray:
    """Deterministic stand-in for a real codec: derives a fixed-size float
    vector from the payload hash. Replace with a real decoder on clusters
    with imaging/audio libs; raise NotImplementedError to surface misuse."""
    h = hashlib.md5(payload).digest()
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    return np.tile(rng, 2)[:32] / 255.0


DECODERS = {"image": _fake_decode, "audio": _fake_decode, "video": _fake_decode}


def extract_features(assets: DataFrame, frame_stride_ms: int = 1000) -> DataFrame:
    """Decode + feature-extract per asset, Arrow-batched.

    video: frame-sample count = duration // stride (sampling itself is the
    decoder's job); image/audio: single 'frame'."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, n_frames, oks = [], [], []
            for payload, modality, dur in zip(pdf["payload"], pdf["modality"], pdf["duration_ms"]):
                dec = DECODERS.get(modality)
                # a NULL payload (corrupt upstream asset) degrades to
                # ok=False like an unknown modality — one bad asset in a
                # 100-TB table must not abort the whole stage
                if dec is None or payload is None:
                    feats.append(None)
                    n_frames.append(0)
                    oks.append(False)
                    continue
                vec = dec(bytes(payload), modality)
                feats.append(vec.tolist())
                # NULL duration arrives as NaN (Arrow int column with nulls
                # becomes float64 in pandas); a video without a known
                # duration samples a single frame instead of crashing
                if modality == "video" and not pd.isna(dur):
                    n_frames.append(max(int(dur) // frame_stride_ms, 1))
                else:
                    n_frames.append(1)
                oks.append(True)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "modality": pdf["modality"].to_numpy(),
                    "feat": feats,
                    "n_frames": n_frames,
                    "ok": oks,
                }
            )

    cols = assets.select("asset_id", "modality", "duration_ms", "payload")
    return cols.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_metadata(assets: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize plan (Catalyst-only): target dims preserving aspect ratio.
    The byte-level resample belongs in the decoder UDF; the plan column lets
    Catalyst prune assets already small enough before any decode happens."""
    side = F.greatest(F.col("width"), F.col("height")).cast("double")
    # zero/NULL-dimension assets get scale 1.0 (no resize plan) — a bare
    # division would throw DIVIDE_BY_ZERO under Spark 4's default ANSI mode
    scale = F.when(side > 0, F.least(F.lit(1.0), F.lit(float(max_side)) / side)).otherwise(
        F.lit(1.0)
    )
    # round + floor-at-1: a truncating cast gives target 0 for extreme
    # aspect ratios (1x2000 at max_side 512 -> int(0.256) = 0), an invalid
    # plan any real decoder would reject
    def _dim(c):
        return F.greatest(F.round(c * scale).cast("int"), F.lit(1))

    return (
        assets.withColumn(
            "target_w", F.when(F.col("width") > 0, _dim(F.col("width"))).otherwise(F.lit(0))
        )
        .withColumn(
            "target_h", F.when(F.col("height") > 0, _dim(F.col("height"))).otherwise(F.lit(0))
        )
        .withColumn("needs_resize", scale < 1.0)
    )
