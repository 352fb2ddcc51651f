"""Multimodal column plumbing (SURVEY.md §2B B60 + north star).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct riding alongside — the standard Spark multimodal layout (cf.
``spark.read.format("binaryFile")``: path/length/content). The
decode/feature-extract stage is a ``mapInPandas`` pass over Arrow record
batches: per-batch, bounded-memory, schema declared up front.

The actual media codecs are NOT in this container (SURVEY.md build
constraints), so ``decode_image_stub`` is a clearly-marked deterministic
fake — the Spark-side plumbing (binary column, metadata struct,
mapInPandas batch shape, output schema) is real and oracle-checked: the
fake "decode" derives width/height/checksum from the bytes in a way
DuckDB can recompute from the source text.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table


def decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """STUB decode: deterministic fake for (width, height, checksum).

    A real implementation would hand ``payload`` to PIL/ffmpeg — those
    libs are not in this container. The fake derives dimensions from the
    byte length and checksums the payload, so the full Spark pipeline
    (binary in → struct out) is exercised end-to-end and remains
    oracle-verifiable.
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, hashlib.md5(payload).hexdigest()


@query(
    "q_multimodal",
    oracle="""
SELECT
  doc_id,
  octet_length(encode(text)) AS n_bytes,
  'image/fake' AS media_type,
  (octet_length(encode(text)) % 640) + 1 AS width,
  (octet_length(encode(text)) % 480) + 1 AS height,
  md5(text) AS checksum
FROM documents
""",
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column pipeline (B60).

    text → ``encode(utf-8)`` manufactures the opaque binary payload
    (stand-in for image bytes) + typed metadata → ``mapInPandas``
    "decode" (stubbed, see :func:`decode_image_stub`) emits a typed
    feature row per media object. Batch shape, schema, and partitioning
    are exactly what a real image decode pass uses; only the codec call
    is fake.
    """
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.octet_length(F.col("text")).alias("n_bytes"),
        ).alias("meta"),
    )

    out_schema = (
        "doc_id bigint, n_bytes int, media_type string, "
        "width int, height int, checksum string"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One Arrow batch at a time → bounded memory however large the
        # corpus; this is where PIL.Image.open(BytesIO(p)) would go.
        for pdf in batches:
            decoded = pdf["payload"].map(decode_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "checksum": decoded.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(decode_batches, schema=out_schema)
