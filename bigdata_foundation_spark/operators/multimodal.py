"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns beside typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms, so each executor processes whole record
batches without JVM↔Python per-row overhead. The actual codec step is
STUBBED (no image/audio libs in this container — clearly marked below)
behind a deterministic fake, but the Spark-side contract — schemas,
batch shapes, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB — deterministic stand-in for a real image/audio decode.

    A real deployment swaps this one function for PIL/libav decode;
    everything around it (Arrow batching, schema, partitioning) is the
    production plumbing. Raises nothing: any bytes 'decode'.
    """
    digest = hashlib.sha256(payload or b"").digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    feature = [b / 255.0 for b in digest[:8]]
    return width, height, feature


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from any source column — the ingest shape
    a binary-bearing parquet would give (payload + typed metadata)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(payload).cast("long").alias("byte_len"),
    )


def decode_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    Keeps media_id/media_type/byte_len typed columns; adds width,
    height and a fixed-width float feature vector. Partitioning is
    preserved — no shuffle; each task maps its batches independently,
    which is exactly the 100 TB behavior you want for codec work."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(_map, schema=DECODED_SCHEMA)


def resize_stub(decoded: DataFrame, max_side: int = 64) -> DataFrame:
    """'Resize': scale the fake dimensions to fit max_side, preserving
    aspect ratio — pure column arithmetic; a real resize would be a
    second mapInPandas over payloads."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    # Atomic withColumns: chained withColumn calls would rebind the
    # `scale` expression's width reference to the already-resized width
    # when computing height (found by the DuckDB oracle).
    return decoded.withColumns(
        {
            "width": F.ceil(F.col("width") * scale).cast("int"),
            "height": F.ceil(F.col("height") * scale).cast("int"),
        }
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling': one row per sampled offset per payload —
    the explode shape a video frame sampler produces (frame index +
    frame payload slice), with deterministic fake frames."""
    n_frames = F.least(
        F.greatest((F.col("byte_len") / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return media.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(1), n_frames)).alias("frame_idx", "_f"),
        F.substring(F.col("payload"), F.col("_f") * every_n_bytes, every_n_bytes).alias("frame_payload"),
    ).select("media_id", "frame_idx", F.col("frame_payload"))
