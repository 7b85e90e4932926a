"""Multimodal column plumbing (SURVEY §7 P6).

Images/audio/video are opaque ``binary`` columns plus typed metadata
structs. The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signatures, partitioning — is real and tested; the actual media decode is
STUBBED (this container has no image/audio libs): ``decode_stub=True``
computes deterministic fake features from the raw bytes, and
``decode_stub=False`` raises NotImplementedError where a real decoder
(PIL/torchaudio/ffmpeg) would plug in.

At scale: mapInPandas streams Arrow batches through Python workers;
binary payloads stay off the driver, and `spark.sql.execution.arrow.
maxRecordsPerBatch` bounds worker memory for large blobs. Feature
extraction parallelism = input partitions.
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
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def text_as_media(df: DataFrame, id_col: str, text_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Build a media-shaped frame from any source column: binary payload +
    metadata struct. With real images the payload comes from
    ``spark.read.format('binaryFile')`` — identical schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True, feat_dim: int = 4) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Stub decode: byte length, additive checksum mod 2^31, and a fake
    feature vector from evenly-sampled byte values / 255. Deterministic,
    so the pipeline is testable end-to-end without media libs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg — "
                    "not available in this container; use decode_stub=True"
                )
            payloads = pdf["payload"]
            byte_len = payloads.map(lambda b: len(b) if b is not None else 0)
            checksum = payloads.map(
                lambda b: int(sum(b) % 2**31) if b is not None else 0
            )

            def feat(b):
                if not b:
                    return [0.0] * feat_dim
                step = max(len(b) // feat_dim, 1)
                return [float(b[min(i * step, len(b) - 1)]) / 255.0 for i in range(feat_dim)]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": byte_len.astype("int64"),
                    "checksum": checksum,
                    "feature": payloads.map(feat),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
