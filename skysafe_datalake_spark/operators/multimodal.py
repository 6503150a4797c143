"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with Arrow-batched (mapInPandas) decode/feature stages.

Design (for 100 TB of media): the engine treats image/audio/video as
``binary`` columns with a ``media_meta`` struct. Heavy per-item work
runs in Arrow-batched Pandas stages so Python is amortized over
thousands of rows per batch; the surrounding plan (partitioning,
pruning, joins on metadata) stays JVM-native. Batch size is governed
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so a
batch of decoded frames fits executor memory.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are stubbed: ``decode_stub=True`` computes
deterministic fake features (byte statistics) with the REAL schema,
batching, and partitioning; ``decode_stub=False`` raises
NotImplementedError where the codec call belongs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),  # image|audio|video
        StructField("format", StringType()),      # png|wav|mp4|...
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),      # images/video
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),   # audio/video
    ]
)

MEDIA_FEATURES = StructType(
    [
        StructField("item_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_entropy", DoubleType()),
        StructField("feature_vec", ArrayType(DoubleType())),
    ]
)


def attach_media_meta(
    df: DataFrame, payload: Column, media_type: str, fmt: str
) -> DataFrame:
    """Wrap a binary payload column with the typed metadata struct —
    pure JVM expressions (metadata stays queryable/prunable without
    touching the payload bytes)."""
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col("media")).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def extract_media_features(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    media_col: str = "media",
    decode_stub: bool = True,
    feature_dim: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over binary media payloads.

    Real pipeline shape: ``mapInPandas`` receives pyarrow-backed
    pandas batches (binary → bytes objects), decodes each item, and
    emits fixed-schema feature rows. The stub computes byte-level
    statistics + a deterministic byte-histogram ``feature_vec`` so
    schema/batching/distribution are fully exercised and testable.
    """
    import numpy as np
    import pandas as pd

    if not decode_stub:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg/librosa — not in this "
            "container; run with decode_stub=True for plumbing"
        )

    dim = feature_dim

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for item_id, payload in zip(pdf[id_col], pdf[media_col]):
                data = np.frombuffer(payload or b"", dtype=np.uint8)
                n = int(data.size)
                if n == 0:
                    out.append((int(item_id), 0, 0.0, 0.0, [0.0] * dim))
                    continue
                hist = np.bincount(data % dim, minlength=dim).astype("float64")
                probs = np.bincount(data, minlength=256) / n
                nz = probs[probs > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                out.append(
                    (
                        int(item_id),
                        n,
                        float(data.mean()),
                        entropy,
                        (hist / n).tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id",
                    "n_bytes",
                    "byte_mean",
                    "byte_entropy",
                    "feature_vec",
                ],
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        batches, schema=MEDIA_FEATURES
    )


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    media_col: str = "media",
    every_n_bytes: int = 1024,
    frame_bytes: int = 64,
) -> DataFrame:
    """Frame-sampling plumbing (video → frames surrogate): emits one
    row per sampled window of the payload, exercising the 1→N
    mapInPandas fan-out shape a real frame sampler has. Stub slices
    raw bytes; a real impl would demux keyframes."""
    import pandas as pd

    schema = StructType(
        [
            StructField("item_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for item_id, payload in zip(pdf[id_col], pdf[media_col]):
                data = bytes(payload or b"")
                for frame_no, off in enumerate(
                    range(0, len(data), every_n_bytes)
                ):
                    rows.append(
                        (int(item_id), frame_no, data[off : off + frame_bytes])
                    )
            yield pd.DataFrame(rows, columns=["item_id", "frame_no", "frame"])

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        batches, schema=schema
    )
