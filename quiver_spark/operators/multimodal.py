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
