"""Multimodal (image/audio/video) column plumbing.

Model: opaque ``binary`` payload column + typed metadata struct, processed
with Arrow-batched ``mapInPandas`` featurizers.  The container has no
image/audio codecs, so the decode kernels are STUBBED (deterministic fake or
NotImplementedError) — the Spark-side contract (schemas, batch iteration,
partitioning) is real and tested (tests/test_multimodal.py).

At 100 TB: payloads stay columnar in parquet; mapInPandas streams
Arrow batches so an executor never materializes a partition of blobs at
once; `spark.sql.files.maxPartitionBytes` (plus parquet row-group sizing at
write time) bounds per-task memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, media_type string, n_bytes long, feature array<float>"

_HAS_CODECS = False  # no PIL/ffmpeg in this container — stubbed decode
_FEATURE_DIM = 16


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from the documents fixture: payload = utf-8 bytes
    (stand-in blob), media_type round-robin, meta struct populated."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, media_type: str) -> list[float]:
    """Deterministic fake decode: real codecs are unavailable (see module
    docstring).  Produces a length-_FEATURE_DIM float vector from byte
    statistics — stable across runs/partitions."""
    if not _HAS_CODECS:
        if payload is None:
            return [0.0] * _FEATURE_DIM
        return [float(payload[i % len(payload)]) / 255.0 for i in range(_FEATURE_DIM)]
    raise NotImplementedError("real image/audio decode requires codec libraries")


def extract_features(media: DataFrame) -> DataFrame:
    """Featurize payloads via mapInPandas (Arrow batch iterator).

    The UDF signature/batch shape is the production contract; swapping
    _decode_stub for a real decoder is a one-line change.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": pdf.apply(
                        lambda r: _decode_stub(r["payload"], r["media_type"]), axis=1
                    ),
                }
            )

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: updates meta, passes payload through the same
    mapInPandas contract (decode+resize stubbed)."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.codec").alias("codec"),
        ),
    )


def frame_sample_stub(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame-sampling plumbing: explodes n_frames into frame rows
    (payload decode stubbed — frame index is the real output)."""
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
        "payload",
    )
