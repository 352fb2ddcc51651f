"""Batch sink operators (SURVEY.md §2B B4-B8 batch side: layout-aware
writes).

The reference's sink is an opaque user callback per batch
(async_data_pipeline.go:71); the engine's batch sink is a *layout
decision*: a corpus written partitioned by its consumption key (split,
lang, date) is the difference between reading 1/N of the data and
reading all of it, for every downstream job, forever. The query here
writes the canonical training layout (hive-partitioned by train/valid/
test split) and proves round-trip integrity against the source corpus.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from asyncdatapipeline_spark.llm.filtering import split_exprs
from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table


def _scratch(sf_dir: str, tag: str) -> str:
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), "adps_sink", key, tag)


@query(
    "q_sink_partitioned",
    # The oracle computes the per-split summary straight from the source
    # corpus — the sink round-trip must reproduce it exactly. The
    # content checksum is an order-independent sum of a 32-bit md5
    # prefix per (doc_id, text) pair, so a dropped/duplicated/mangled
    # row in any partition shows up as a value mismatch.
    oracle="""
WITH s AS (
  SELECT doc_id, text,
         CASE
           WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::UINTEGER < 230
             THEN 'train'
           WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::UINTEGER < 243
             THEN 'valid'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs,
       min(doc_id) AS min_id, max(doc_id) AS max_id,
       CAST(sum(('0x' || substr(md5(doc_id::VARCHAR || ':' || text), 1, 8))
           ::UBIGINT::BIGINT) AS BIGINT) AS content_sum
FROM s GROUP BY split ORDER BY split
""",
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned batch sink + round-trip verification (B4 batch side):
    write the corpus hive-partitioned by its train/valid/test split
    (``partitionBy`` — one directory per split, the layout every
    training job consumes), read it back, and summarize per split with
    an order-independent content checksum the oracle recomputes from
    the source.

    Scale notes baked into the write: ``partitionBy`` on a
    LOW-CARDINALITY derived column only (a high-cardinality partition
    key is the small-files death spiral — 100 TB / |keys| files per
    task); rows are pre-shuffled by the partition column via
    ``repartition(split)`` so each task writes each split once (without
    it, every task opens a file per split it sees — tasks × splits
    files). Readers then prune whole directories on split = 'train'
    (the same PartitionFilters machinery q_scan_partition_pruned
    audits).
    """
    out = _scratch(sf_dir, "by_split")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", *split_exprs()
    ).drop("bucket")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            d.repartition(F.col("split"))
            .write.mode("overwrite")
            .partitionBy("split")
            .parquet(out)
        )
    # Explicit read schema: an EMPTY corpus writes a layout with no data
    # files, where schema inference fails — and at 100 TB you pin the
    # read schema anyway rather than pay footer sampling.
    back = spark.read.schema(d.schema).parquet(out)
    # 32-bit md5 prefix per (id, text) pair, summed per split: a lost,
    # duplicated, or cross-partition-misfiled row breaks the sum.
    # F.concat (NOT concat_ws) so a NULL text NULL-propagates and the
    # row drops out of the sum — exactly the oracle's `||` semantics;
    # concat_ws would silently hash just the id for NULL-text rows.
    pair_hash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"), F.col("text")
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        back.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.sum(pair_hash).alias("content_sum"),
        )
        .orderBy("split")
    )
