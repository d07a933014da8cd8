"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched pandas UDFs.

Codec-free REAL paths: PPM (P6) image decode/resize and a
concatenated-PPM frame sampler are implemented with pure numpy byte
parsing (no external codec), over deterministic md5-derived synthetic
payloads a SQL oracle can regenerate pixel-exactly. Compressed formats
(png/jpeg/mp4) need codec libraries absent from this container and
raise NotImplementedError loudly at the parse call -- the Arrow-batched
Spark plumbing (schema, partitioning, batch shapes) is identical, so a
real codec plugs into the same spot. The byte-histogram extractor is a
format-agnostic content fingerprint for any binary payload.

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


PPM_W, PPM_H = 16, 8  # default synthetic raster geometry


def _ppm_header(w: int, h: int) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode()


def synth_ppm_assets(
    spark: SparkSession, n: int, seed: int = 42, w: int = PPM_W, h: int = PPM_H
) -> DataFrame:
    """Deterministic VALID binary images: PPM (P6) payloads whose raster
    bytes are a repeated md5 chain of (seed, block, asset_id) -- the same
    engine-portable construction as :func:`synth_assets`, so a SQL oracle
    can regenerate every pixel bit-for-bit. ceil(w*h*3/16) md5 blocks,
    truncated to the raster length."""
    raster_len = w * h * 3
    n_blocks = (raster_len + 15) // 16
    raster = F.concat(
        *[
            F.unhex(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:{k}:"), F.col("asset_id").cast("string")
                    ).cast("binary")
                )
            )
            for k in range(n_blocks)
        ]
    )
    # binary slice: substring works on binary columns (1-based)
    payload = F.concat(
        F.lit(_ppm_header(w, h)), F.substring(raster, 1, raster_len)
    )
    return (
        spark.range(n)
        .withColumnRenamed("id", "asset_id")
        .select(
            "asset_id",
            F.lit("image").alias("modality"),
            payload.alias("payload"),
            F.struct(
                F.lit(w).alias("width"),
                F.lit(h).alias("height"),
                F.lit("ppm").alias("format"),
            ).alias("meta"),
        )
    )


def _parse_ppm(buf: bytes) -> "np.ndarray":
    """Pure-numpy P6 parser: header = magic, dims, maxval separated by
    whitespace; raster = h x w x 3 uint8. Raises on non-P6 input."""
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts, idx = [], 2
    while len(parts) < 3:
        while idx < len(buf) and buf[idx : idx + 1].isspace():
            idx += 1
        start = idx
        while idx < len(buf) and not buf[idx : idx + 1].isspace():
            idx += 1
        parts.append(int(buf[start:idx]))
    idx += 1  # single whitespace after maxval, then raster
    w, h, _maxval = parts
    raster = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=idx)
    return raster.reshape(h, w, 3)


def decode_image(assets: DataFrame) -> DataFrame:
    """REAL image decode for PPM (P6) payloads -- pure numpy byte
    parsing, no external codec -- returning per-asset geometry and exact
    per-channel means. Formats that need a real codec library (png/jpeg:
    PIL/cv2, absent in this sandbox) raise NotImplementedError loudly;
    the Arrow-batched plumbing is identical either way, so plugging a
    codec in changes only the parse call."""
    out_schema = (
        "asset_id long, width int, height int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                if not bytes(buf).startswith(b"P6"):
                    raise NotImplementedError(
                        "only PPM (P6) decodes codec-free; png/jpeg need "
                        "PIL/cv2 (absent in this sandbox)"
                    )
                img = _parse_ppm(bytes(buf))
                m = img.reshape(-1, 3).astype(np.float64)
                # exact rational means (integer byte sums / pixel count)
                s = m.sum(axis=0) / m.shape[0]
                rows.append(
                    (int(aid), img.shape[1], img.shape[0], s[0], s[1], s[2])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "mean_r", "mean_g", "mean_b",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=out_schema)


def resize_nearest(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of PPM payloads (index sampling -- the
    codec-free core of a thumbnail stage). Returns re-encoded PPM
    payloads with updated metadata."""
    out_schema = "asset_id long, payload binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                img = _parse_ppm(bytes(buf))
                h, w, _ = img.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                small = img[yi][:, xi]
                rows.append(
                    (
                        int(aid),
                        _ppm_header(out_w, out_h) + small.tobytes(),
                        out_w,
                        out_h,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "payload", "width", "height"]
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=out_schema)


WAV_SAMPLES, WAV_RATE = 192, 8000  # default synthetic audio geometry


def _wav_header(n_samples: int, rate: int) -> bytes:
    """Canonical 44-byte RIFF/WAVE header for 16-bit mono PCM."""
    import struct

    data_size = n_samples * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", data_size)
    )


def synth_wav_assets(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    n_samples: int = WAV_SAMPLES,
    rate: int = WAV_RATE,
) -> DataFrame:
    """Deterministic VALID audio: RIFF/WAVE 16-bit mono PCM whose sample
    bytes are the md5 chain of (seed, block, asset_id) -- SQL-regenerable
    bit-for-bit, same discipline as :func:`synth_ppm_assets`."""
    data_len = n_samples * 2
    n_blocks = (data_len + 15) // 16
    pcm = F.concat(
        *[
            F.unhex(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:{k}:"), F.col("asset_id").cast("string")
                    ).cast("binary")
                )
            )
            for k in range(n_blocks)
        ]
    )
    payload = F.concat(
        F.lit(_wav_header(n_samples, rate)), F.substring(pcm, 1, data_len)
    )
    return (
        spark.range(n)
        .withColumnRenamed("id", "asset_id")
        .select(
            "asset_id",
            F.lit("audio").alias("modality"),
            payload.alias("payload"),
            F.struct(
                F.lit(n_samples).alias("width"),
                F.lit(1).alias("height"),
                F.lit("wav").alias("format"),
            ).alias("meta"),
        )
    )


def decode_audio(assets: DataFrame) -> DataFrame:
    """REAL audio decode for RIFF/WAVE 16-bit PCM -- pure-numpy struct
    parsing, no codec library. Returns per-asset sample geometry and the
    exact mean-square energy (integer sample squares summed in int64,
    one double division -- SQL-reproducible to the bit). Compressed
    formats (mp3/ogg) raise loudly at the parse call."""
    import struct

    out_schema = (
        "asset_id long, sample_rate int, n_samples int, "
        "duration_sec double, energy double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(buf)
                if not (buf.startswith(b"RIFF") and buf[8:12] == b"WAVE"):
                    raise NotImplementedError(
                        "only RIFF/WAVE PCM decodes codec-free; mp3/ogg "
                        "need an audio codec (absent in this sandbox)"
                    )
                # walk chunks: fmt_ then data
                pos, rate, data = 12, None, None
                while pos + 8 <= len(buf):
                    cid = buf[pos : pos + 4]
                    (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                    body = buf[pos + 8 : pos + 8 + clen]
                    if cid == b"fmt ":
                        fmt_code, _ch, rate = struct.unpack("<HHI", body[:8])
                        if fmt_code != 1:
                            raise NotImplementedError("only PCM (fmt 1)")
                    elif cid == b"data":
                        data = body
                    pos += 8 + clen + (clen & 1)
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                energy = float((samples * samples).sum() / len(samples))
                rows.append(
                    (
                        int(aid),
                        int(rate),
                        len(samples),
                        float(len(samples) / rate),
                        energy,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_samples",
                    "duration_sec", "energy",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=out_schema)


def frame_sample(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling over the codec-free container: a 'video'
    payload is concatenated fixed-geometry PPM frames (the moral
    equivalent of raw YUV chunks); every_n-th frame is decoded to its
    channel means. Real containers (mp4/webm) need ffmpeg/av -- absent
    here -- and would replace only the splitting step."""
    out_schema = (
        "asset_id long, frame_idx int, mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(buf)
                if not buf.startswith(b"P6"):
                    raise NotImplementedError(
                        "only concatenated-PPM containers decode codec-free"
                    )
                img0 = _parse_ppm(buf)
                h, w, _ = img0.shape
                frame_len = len(_ppm_header(w, h)) + w * h * 3
                n_frames = len(buf) // frame_len
                for fi in range(0, n_frames, every_n):
                    img = _parse_ppm(buf[fi * frame_len : (fi + 1) * frame_len])
                    s = img.reshape(-1, 3).astype(np.float64)
                    s = s.sum(axis=0) / s.shape[0]
                    rows.append((int(aid), fi, s[0], s[1], s[2]))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "frame_idx", "mean_r", "mean_g", "mean_b"],
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=out_schema)
