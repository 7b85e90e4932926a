"""Multimodal column plumbing (SURVEY §7 P6).

Images/audio/video are opaque ``binary`` columns plus typed metadata
structs. The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signatures, partitioning — is identical for every format; what varies is
only the per-payload decode function:

- ``decode_stub=True`` (default): deterministic fake features from the
  raw bytes — byte-exact reproducible, no decoder dependence, the mode
  the oracle-checked queries use.
- ``decode_stub=False``: REAL decode via operators/mediacodec (stdlib
  ``struct``/``wave`` + numpy): PPM and 24-bit BMP images, PCM WAV
  audio. Unsupported mimes raise NotImplementedError with the library
  (PIL/ffmpeg) that would plug into the same function at deployment.

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

    Real decode (decode_stub=False): PPM/BMP payloads yield mean+std RGB
    features, WAV payloads yield (duration, rms, peak, zcr) — see
    mediacodec.image_features / audio_features. byte_len and checksum
    stay identical across modes (they never decode).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dataframe_kotlin_spark.operators import mediacodec as mc

        for pdf in batches:
            payloads = pdf["payload"]
            byte_len = payloads.map(lambda b: len(b) if b is not None else 0)
            checksum = payloads.map(
                lambda b: int(sum(b) % 2**31) if b is not None else 0
            )

            def feat_stub(b):
                if not b:
                    return [0.0] * feat_dim
                step = max(len(b) // feat_dim, 1)
                return [float(b[min(i * step, len(b) - 1)]) / 255.0 for i in range(feat_dim)]

            if decode_stub:
                feature = payloads.map(feat_stub)
            else:
                mimes = pdf["meta"].map(lambda m: m["mime"] if m is not None else None)

                def feat_real(b, mime):
                    if not b:
                        return [0.0] * feat_dim
                    b = bytes(b)
                    if mime in mc.AUDIO_MIMES:
                        rate, _, samples = mc.parse_wav(b)
                        return mc.audio_features(rate, samples, feat_dim)
                    _, _, px = mc.decode_image(b, mime)  # raises for unknown mime
                    return mc.image_features(px, feat_dim)

                feature = pd.Series(
                    [feat_real(b, m) for b, m in zip(payloads, mimes)], index=pdf.index
                )

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": byte_len.astype("int64"),
                    "checksum": checksum,
                    "feature": feature,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


# resize preserves the media schema ("same media schema in and out") —
# one definition, so a new MEDIA_SCHEMA field cannot silently diverge
RESIZED_SCHEMA = MEDIA_SCHEMA


def resize_media(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Resize step: same media schema in and out, so resize composes with
    extract_features/sample_frames in either order.

    Stub 'resize' truncates/zero-pads the payload to width*height bytes
    (deterministic). Real resize (decode_stub=False) decodes PPM/BMP via
    mediacodec, nearest-neighbor resamples, and re-encodes as P6 PPM
    (mime updated accordingly) — same mapInPandas shape, same schema
    contract a PIL/cv2 implementation would use.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dataframe_kotlin_spark.operators import mediacodec as mc

        for pdf in batches:

            def rz_stub(b):
                if b is None:
                    return None
                b = bytes(b)
                return b[:target] if len(b) >= target else b + b"\x00" * (target - len(b))

            if decode_stub:
                payload = pdf["payload"].map(rz_stub)
                meta = pdf["meta"].map(
                    lambda m: {
                        "mime": m["mime"] if m is not None else None,
                        "width": width,
                        "height": height,
                    }
                )
            else:

                def rz_real(b, m):
                    if b is None:
                        return None
                    _, _, px = mc.decode_image(bytes(b), m["mime"] if m else None)
                    return mc.write_ppm(mc.resize_nearest(px, width, height))

                payload = pd.Series(
                    [rz_real(b, m) for b, m in zip(pdf["payload"], pdf["meta"])],
                    index=pdf.index,
                )
                meta = pdf["meta"].map(
                    lambda m: {
                        "mime": "image/x-portable-pixmap" if m is not None else None,
                        "width": width,
                        "height": height,
                    }
                )

            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payload, "meta": meta}
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling: one input row -> n output rows (UDTF shape via
    mapInPandas). Stub treats the payload as n equal byte slices. Real
    mode (decode_stub=False) samples n evenly-spaced WAV segments, each
    re-encoded as a standalone WAV payload; video mimes raise
    NotImplementedError naming the decoder (ffmpeg) that plugs into the
    same function. The row-expansion plumbing, schema, and partition
    behavior are identical in every mode. Output partitioning == input
    partitioning (no shuffle introduced)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dataframe_kotlin_spark.operators import mediacodec as mc

        for pdf in batches:
            metas = pdf["meta"] if "meta" in pdf else [None] * len(pdf)
            ids, idxs, frames = [], [], []
            for mid, b, m in zip(pdf["media_id"], pdf["payload"], metas):
                if b is None:
                    continue
                b = bytes(b)
                if decode_stub:
                    step = max(len(b) // n_frames, 1)
                    k = min(n_frames, len(b))
                    for i in range(k):
                        ids.append(mid)
                        idxs.append(i)
                        # last frame takes the remainder so the frames
                        # concatenate back to the full payload
                        end = (i + 1) * step if i < k - 1 else len(b)
                        frames.append(b[i * step : end])
                    continue
                mime = m["mime"] if m is not None else None
                if mime not in mc.AUDIO_MIMES:
                    raise NotImplementedError(
                        f"real frame sampling for mime {mime!r} requires ffmpeg; "
                        "WAV audio segments supported via the stdlib codec"
                    )
                rate, _, samples = mc.parse_wav(b)
                n = samples.shape[0]
                seg = max(n // n_frames, 1)
                k = min(n_frames, n)
                for i in range(k):
                    ids.append(mid)
                    idxs.append(i)
                    # last segment takes the tail samples (lossless split)
                    end = (i + 1) * seg if i < k - 1 else n
                    frames.append(mc.write_wav(rate, samples[i * seg : end]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame": frames}
            )

    cols = ["media_id", "payload"] + (["meta"] if "meta" in media.columns else [])
    return media.select(*cols).mapInPandas(run, FRAME_SCHEMA)


def chunk_pcm_audio(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    sample_rate: int,
    bytes_per_sample: int,
    chunk_seconds: float,
) -> DataFrame:
    """Split raw-PCM audio payloads into fixed-duration chunks — fully
    JVM-side, NO stub: for uncompressed PCM the chunk boundary is exact
    byte arithmetic (chunk_bytes = rate * width * seconds), and binary
    substring slices without decoding. One input row explodes into
    ceil(len/chunk_bytes) chunk rows carrying (chunk_idx, start_s,
    end_s, chunk payload); no shuffle — partitioning follows the input,
    and Arrow never sees the bytes (everything stays in codegen).
    Compressed formats (mp3/flac) need a decoder at the extract_features
    stage; the chunk scheduling layer here is identical either way.
    """
    chunk_bytes = int(sample_rate * bytes_per_sample * chunk_seconds)
    assert chunk_bytes > 0
    plen = F.length(F.col(payload_col))
    n_chunks = F.ceil(plen / chunk_bytes).cast("int")
    # NULL/empty payloads emit ZERO chunk rows (ceil(len/chunk_bytes)
    # row-count contract): greatest() would skip the NULL and fabricate
    # a phantom full-duration chunk
    out = df.filter(n_chunks > 0).withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    chunk = F.expr(f"substring({payload_col}, chunk_idx * {chunk_bytes} + 1, {chunk_bytes})")
    dur = float(chunk_seconds)
    return out.select(
        F.col(id_col),
        "chunk_idx",
        (F.col("chunk_idx") * dur).alias("start_s"),
        F.least(
            (F.col("chunk_idx") + 1) * dur,
            plen / (sample_rate * bytes_per_sample),
        ).alias("end_s"),
        chunk.alias("chunk"),
    )
