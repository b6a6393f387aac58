"""Multimodal columns (SURVEY.md §2.10 M6).

Images/audio/video are opaque ``binary`` payloads + a typed metadata
struct (schemas.MEDIA). The Spark-side plumbing — schema, Arrow batch
shape, partition sizing — is real and tested; the actual codec work
(image decode, resize, frame sampling) is stubbed because the media
libraries are not in this container. Stubs are deterministic so tests
can assert the full pipeline shape.

Scale notes: binary payloads blow up row size, so
``spark.sql.files.maxPartitionBytes`` should be sized down for media
tables, and decode runs in ``mapInPandas`` (Arrow batches) with
payloads never passing through a Python row loop one-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

DECODED_SCHEMA = (
    "media_id long, mime string, n_bytes long, width int, height int, feature array<double>"
)


def read_media_dir(spark, path: str, *, glob: str = "*", mime: str = "application/octet-stream") -> DataFrame:
    """Object-store media ingestion via Spark's binaryFile source
    (S-series analog for media): one row per file with path, length,
    modificationTime, content — mapped onto the MEDIA contract.
    Partition sizing note: binaryFile caps rows per task by
    ``spark.sql.files.maxPartitionBytes``; size it to a few payloads."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.col("length").cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
        F.col("path").alias("source_path"),
    )


def attach_binary(df: DataFrame, *, src_col: str, id_col: str, mime: str) -> DataFrame:
    """Build a media table from any string column: payload = utf-8
    bytes (deterministic fake for a real object-store read), metadata
    struct populated from the payload itself."""
    payload = F.col(src_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decoder: derives a fake
    (width, height) and a 4-dim feature from the bytes. Replace with
    PIL/libvips behind this exact signature in a real deployment."""
    n = len(payload)
    width = (n % 64) + 1
    height = (n % 48) + 1
    s = sum(payload[: min(n, 256)])
    feature = [float(n), float(width), float(height), float(s % 997)]
    return width, height, feature


def decode_media(df: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batch in/out).

    The UDF body touches pandas Series of raw bytes — the batch shape
    a real decoder needs. Codec libraries aren't installed here, so
    ``_fake_decode`` stands in; the Spark plumbing is the deliverable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize is pure codec work — not implementable in-container."""
    raise NotImplementedError(
        "media resize requires an image library (PIL/libvips); "
        "wire it into decode_media's mapInPandas batch loop"
    )


def frame_sample_stub(df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame sampling: payload → N frame rows. The Spark shape is
    mapInPandas with an *expanding* batch (one input row → many output
    rows — the iterator-of-DataFrames signature handles fan-out
    natively); the codec is the missing piece in this container."""
    raise NotImplementedError(
        "frame sampling requires a video decoder (pyav/ffmpeg); implement as "
        "mapInPandas yielding one row per sampled frame, schema "
        "'media_id long, frame_idx int, ts_ms long, frame binary'"
    )


def audio_features_stub(df: DataFrame, window_ms: int = 25) -> DataFrame:
    """Audio feature extraction (e.g. log-mel windows): same expanding
    mapInPandas shape as frame sampling; decoder not in-container."""
    raise NotImplementedError(
        "audio features require an audio decoder (soundfile/librosa); implement "
        "as mapInPandas yielding 'media_id long, window_idx int, feature array<float>'"
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Typed-metadata analytics over the binary table — stays entirely
    in built-ins (no payload access): bytes histogram per mime."""
    return df.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.min("meta.n_bytes").alias("min_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )
