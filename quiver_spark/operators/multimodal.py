"""Multimodal column plumbing (driver mandate): treat image/audio/video as
opaque BinaryType columns with typed metadata, processed by Arrow-batched
mapInPandas. The container has no image/audio libraries, so the decode step
is a clearly-marked deterministic stub — the Spark-side plumbing (schema,
batching, partitioning) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from quiver_spark.registry import register
from quiver_spark.tables import load


def with_binary_payload(df: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column (UTF-8 bytes of `text` here —
    in production this is the image/audio blob read from object storage)."""
    return df.withColumn("payload", F.col("text").cast("binary"))


@register(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS nbytes,
       ascii(SUBSTR(text, 1, 1)) AS first_code,
       SUBSTR(md5(text), 1, 8) AS payload_fp
FROM documents
""",
    tags=("multimodal", "binary"),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: byte length, first code
    point, content fingerprint — all JVM built-ins over BinaryType."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.length("payload").alias("nbytes"),
        F.ascii(F.substring("text", 1, 1)).alias("first_code"),
        F.substring(F.md5("payload"), 1, 8).alias("payload_fp"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("nbytes", IntegerType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("decoder", StringType()),
    ]
)


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, feature rows out.

    STUB DECODER: real image decoding (PIL/ffmpeg) is unavailable in this
    container; dimensions are derived deterministically from the payload
    hash so the pipeline shape (schema, batch iteration, column pruning)
    is fully exercised. Swap `_fake_decode` for a real decoder in prod.
    """
    import hashlib

    def _fake_decode(payload: bytes) -> tuple[int, int]:
        h = hashlib.md5(payload).digest()
        return 16 + h[0] % 64, 16 + h[1] % 64

    for pdf in batches:
        dims = [_fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "nbytes": [len(p) for p in pdf["payload"]],
                "fake_width": [w for w, _ in dims],
                "fake_height": [h for _, h in dims],
                "decoder": "stub-md5",
            }
        )


@register(
    "multimodal_decode_features",
    # the stub decoder is md5-deterministic, so the whole mapInPandas
    # pipeline is exactly expressible in SQL: byte k of the digest is the
    # k-th hex pair of md5(text)
    oracle="""
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS nbytes,
       16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) % 64 AS fake_width,
       16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) % 64 AS fake_height,
       'stub-md5' AS decoder
FROM documents
""",
    tags=("multimodal", "mapInPandas"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the multimodal decode pipeline shape (deterministic stub
    decoder, see _decode_batch)."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(
        _decode_batch, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("dst_w", IntegerType()),
        StructField("dst_h", IntegerType()),
    ]
)

#: bounding box for the aspect-preserving resize stub
RESIZE_TARGET = 32


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for the resize stage: decode dims (stub) then
    compute the aspect-preserving target size inside a TARGET×TARGET box
    with pure integer arithmetic (exact in any engine). A real pipeline
    would call PIL's `Image.resize` here; the batching, schema, and
    integer-geometry plumbing are identical."""
    import hashlib

    def _fake_decode(payload: bytes) -> tuple[int, int]:
        h = hashlib.md5(payload).digest()
        return 16 + h[0] % 64, 16 + h[1] % 64

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h = _fake_decode(payload)
            m = max(w, h)
            rows.append(
                (
                    int(doc_id),
                    w,
                    h,
                    (w * RESIZE_TARGET) // m,
                    (h * RESIZE_TARGET) // m,
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "src_w", "src_h", "dst_w", "dst_h"]
        )


@register(
    "multimodal_resize_stub",
    # stub decode dims are md5-deterministic and the target geometry is
    # integer arithmetic, so the whole stage has an exact SQL twin
    oracle=f"""
WITH dims AS (
    SELECT doc_id,
           16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) % 64 AS src_w,
           16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) % 64 AS src_h
    FROM documents
)
SELECT doc_id, src_w, src_h,
       CAST((src_w * {RESIZE_TARGET}) // greatest(src_w, src_h) AS INTEGER) AS dst_w,
       CAST((src_h * {RESIZE_TARGET}) // greatest(src_w, src_h) AS INTEGER) AS dst_h
FROM dims
""",
    tags=("multimodal", "mapInPandas", "resize"),
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving image resize stage (stubbed decode, real
    plumbing): Arrow-batched mapInPandas computing the bounded target
    geometry per payload. Map-side only — resize at corpus scale is
    embarrassingly parallel and this stage shuffles nothing."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(
        _resize_batch, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_fp", StringType()),
    ]
)

#: max frames sampled per "video" payload
MAX_FRAMES = 8
#: bytes per fake frame (payload length // FRAME_BYTES = frame count)
FRAME_BYTES = 16


def _frame_sample_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for frame sampling: each payload is treated as a
    video of ``nbytes // FRAME_BYTES`` frames; a uniform stride samples at
    most MAX_FRAMES of them, emitting one row per sampled frame (the
    one-to-many flat-map shape). The frame fingerprint stands in for the
    decoded frame tensor; ffmpeg would slot in here unchanged."""
    import hashlib

    for pdf in batches:
        out_id, out_idx, out_fp = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // FRAME_BYTES
            if n_frames <= 0:
                continue
            # ceil-divide: floor gives up to 2*MAX_FRAMES-1 sampled frames
            stride = max(1, -(-n_frames // MAX_FRAMES))
            for idx in range(0, n_frames, stride):
                out_id.append(int(doc_id))
                out_idx.append(idx)
                out_fp.append(
                    hashlib.md5(
                        payload + b":" + str(idx).encode()
                    ).hexdigest()[:8]
                )
        yield pd.DataFrame(
            {"doc_id": out_id, "frame_idx": out_idx, "frame_fp": out_fp}
        )


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH vids AS (
    SELECT doc_id, text,
           CAST(octet_length(CAST(text AS BLOB)) // {FRAME_BYTES} AS INTEGER)
               AS n_frames
    FROM documents
),
sampled AS (
    SELECT doc_id, text,
           CAST(unnest(range(0, n_frames,
                             greatest(1, (n_frames + {MAX_FRAMES} - 1)
                                          // {MAX_FRAMES}))) AS INTEGER)
               AS frame_idx
    FROM vids WHERE n_frames > 0
)
SELECT doc_id, frame_idx,
       substr(md5(text || ':' || CAST(frame_idx AS VARCHAR)), 1, 8) AS frame_fp
FROM sampled
""",
    tags=("multimodal", "mapInPandas", "video"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (stubbed decode, real plumbing): one-to-many
    Arrow-batched mapInPandas emitting a row per uniformly-strided frame.
    Map-side row expansion only — no shuffle; downstream stages key on
    (doc_id, frame_idx)."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(
        _frame_sample_batch, schema=FRAME_SCHEMA
    )
