"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched pandas UDFs.

The image/audio decode libraries are not available in this container, so
the *codec* step is stubbed (deterministic fake or NotImplementedError
behind an import guard) -- but everything Spark-side is real and tested:
the schema, the partitioning, the mapInPandas batch shapes, and a real
byte-level feature extractor (normalized byte histogram), which is a
legitimate content fingerprint for binary payloads.

Schema:
  assets(asset_id long, modality string, payload binary,
         meta struct<width int, height int, format string>)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, modality string, payload binary, "
    "meta struct<width:int, height:int, format:string>"
)

N_HIST_BINS = 16


def synth_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets: payload = repeated md5 bytes of
    (seed, asset_id); metadata derived from hashes. Distributed generation
    (spark.range), same discipline as the transcript generator."""
    base = spark.range(n).withColumnRenamed("id", "asset_id")
    payload = F.concat(
        *[
            F.unhex(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:{k}:"), F.col("asset_id").cast("string")
                    ).cast("binary")
                )
            )
            for k in range(4)
        ]
    )
    # modality derived from md5 (not xxhash64) so the construction is
    # reproducible in any engine -- the DuckDB oracle for the entry query
    # recomputes it bit-for-bit (same trick as similarity._hyperplane).
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"mod{seed}:"), F.col("asset_id").cast("string")
                            ).cast("binary")
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(3),
            )
            + 1
        ).cast("int"),
    )
    meta = F.struct(
        (F.pmod(F.xxhash64("asset_id", F.lit(seed + 1)), F.lit(512)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("asset_id", F.lit(seed + 2)), F.lit(512)) + 16).cast("int").alias("height"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("wav"), F.lit("mp4")),
            (F.pmod(F.xxhash64("asset_id", F.lit(seed + 3)), F.lit(4)) + 1).cast("int"),
        ).alias("format"),
    )
    return base.select(
        "asset_id", modality.alias("modality"), payload.alias("payload"), meta.alias("meta")
    )


def byte_histogram_features(assets: DataFrame, bins: int = N_HIST_BINS) -> DataFrame:
    """Real feature extraction over binary payloads: normalized byte
    histogram (bins buckets over 0..255), vectorized over whole Arrow
    batches with one np.bincount per batch."""
    out_schema = "asset_id long, modality string, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"].tolist()
            lens = np.array([len(p) for p in payloads])
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8) >> int(
                np.log2(256 // bins)
            )
            row_id = np.repeat(np.arange(len(payloads)), lens)
            hist = np.zeros((len(payloads), bins))
            np.add.at(hist, (row_id, flat), 1.0)
            hist /= np.maximum(lens, 1)[:, None]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "features": list(hist),
                }
            )

    return assets.mapInPandas(run, schema=out_schema)


def byte_histogram_long(assets: DataFrame, bins: int = N_HIST_BINS) -> DataFrame:
    """:func:`byte_histogram_features` exploded to one row per histogram
    bin -- ``(asset_id, modality, bin, value)``. Scalar columns only, so
    results canonicalize (sort/hash) in any downstream harness; this is
    the shape the driver-contract query uses."""
    wide = byte_histogram_features(assets, bins)
    return wide.select(
        "asset_id",
        "modality",
        F.posexplode("features").alias("bin", "value"),
    )


def decode_image(assets: DataFrame, target_size: tuple[int, int] = (64, 64)) -> DataFrame:
    """Image decode + resize. STUB: requires an image codec (PIL/cv2),
    not present in this container. The Spark plumbing (schema, batching)
    is in place; plug the codec into ``_decode_batch`` on a real cluster.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL/cv2, unavailable in this sandbox; "
            "byte_histogram_features() provides the codec-free path"
        ) from e
    raise NotImplementedError("codec integration point")  # pragma: no cover


def frame_sample(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling. STUB: requires a video codec (see
    decode_image)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/av, unavailable in this sandbox"
    )
