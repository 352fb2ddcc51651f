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


@query(
    "q_sink_dynamic",
    # Final state after the surgical overwrite: 'F' rows carry +1.00,
    # every other status is untouched — which is exactly what the
    # oracle computes from the source, so a static-mode bug (other
    # partitions wiped) or a missed overwrite both hash-FAIL.
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CASE WHEN o_orderstatus = 'F'
                           THEN CAST(o_totalprice AS DECIMAL(18,2))
                                + CAST(1.00 AS DECIMAL(18,2))
                           ELSE CAST(o_totalprice AS DECIMAL(18,2)) END)
                  AS DOUBLE), 2) AS total_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def q_sink_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (B4 sink family): land orders
    partitioned by status, then SURGICALLY replace only the 'F'
    partition with corrected rows (+1.00) under
    ``partitionOverwriteMode=dynamic`` — the restatement operation
    every warehouse runs ("reprocess yesterday's partition") where
    STATIC mode would silently wipe every partition not present in
    the incoming batch (the classic career-limiting overwrite). The
    read-back per-status summary must equal the oracle's final state:
    a wiped partition or a missed overwrite both hash-FAIL.

    Scale shape: the correction batch writes only its own partition's
    files; untouched partitions are never rewritten (restating one day
    of a 100 TB table costs one day's IO). Same low-cardinality
    partition-key discipline as q_sink_partitioned; the summary read
    prunes directories per status.

    Crash-safety (round 7): the restatement commits through the
    GENERATION protocol (sources/generations.py). Generation 1 is the
    landed table; the correction assembles generation 2 by HARD-LINKING
    every untouched partition directory (the local-FS rendition of
    table-format manifest reuse — O(files) metadata ops, zero data IO)
    and dynamic-overwriting only ``o_orderstatus=F`` inside the new
    uncommitted directory. The ``_COMMITTED`` marker lands last, so a
    crash at any point mid-restate leaves generation 1 current and
    intact — previously, a crash between Spark's delete-matched-
    partitions and move-staged-files steps could lose the old 'F'
    partition with no copy anywhere (kill-mid-write pytest in
    tests/test_round7_ops.py).
    """
    from asyncdatapipeline_spark.sources.generations import (
        gc_generations,
        latest_generation,
        link_partitions,
        mark_committed,
        next_generation_dir,
    )

    store = _scratch(sf_dir, "orders_dyn_gen")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        "o_orderstatus",
    )
    if o.isEmpty():  # empty source: nothing to land or restate — an
        # all-empty partitioned dataset has no readable schema
        return spark.createDataFrame(
            [], "o_orderstatus string, n long, total_price double"
        )
    current = latest_generation(spark, store)
    if current is None:
        # land generation 1: the full table, partitioned by status
        gen1 = next_generation_dir(spark, store)
        o.repartition("o_orderstatus").write.mode("overwrite").partitionBy(
            "o_orderstatus"
        ).parquet(gen1)
        mark_committed(spark, gen1)
        # restate into generation 2: link untouched partitions, rewrite F
        fixed = o.filter(F.col("o_orderstatus") == "F").withColumn(
            "price",
            (F.col("price") + F.lit("1.00").cast("decimal(18,2)")).cast(
                "decimal(18,2)"
            ),
        )
        gen2 = next_generation_dir(spark, store)
        with _dynamic_overwrite(spark):
            fixed.repartition("o_orderstatus").write.mode(
                "overwrite"
            ).partitionBy("o_orderstatus").parquet(gen2)
        link_partitions(gen1, gen2, skip_partitions={"o_orderstatus=F"})
        mark_committed(spark, gen2)
        gc_generations(spark, store, keep=2)
        current = gen2
    return (
        spark.read.parquet(current)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("price").cast("double"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


class _dynamic_overwrite:
    """Scoped ``partitionOverwriteMode=dynamic`` (restore on exit — the
    session default stays static, where an unqualified overwrite at
    least fails loudly instead of surgically)."""

    _KEY = "spark.sql.sources.partitionOverwriteMode"

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(self._KEY, "static")
        self.spark.conf.set(self._KEY, "dynamic")

    def __exit__(self, *exc):
        self.spark.conf.set(self._KEY, self.prev)
