"""Training-batch assembly operators (north-star LLM-pipeline family,
BASELINE.json:6): sequence packing and corpus-mixture reporting.

These are the last-mile ops of a pretraining data pipeline — after
scoring (llm/text.py) and dedup (llm/dedup.py), the surviving corpus is
packed into fixed-token context windows and its lang/source mixture is
reported for data-mixing decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table

_CTX_TOKENS = 512  # context-window token budget per pack


@query(
    "q_pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
  FROM documents
),
o AS (
  SELECT source, doc_id, n_tok,
         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
  FROM t
)
SELECT source,
       CAST(floor(start_off / {_CTX_TOKENS}) AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM o
GROUP BY source, pack_id
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into fixed token budgets
    (north-star training-batch assembly).

    The standard pretraining packing scheme: per source stream, documents
    are concatenated in deterministic order (doc_id) and chunked into
    512-token context windows; a document belongs to the window its
    start offset falls in. One window cumsum (running token offset), one
    integer division — no iterative bin-packing, which is inherently
    sequential and does not distribute.

    Scale shape: the window partitions by ``source``, so packing
    parallelizes across streams; within a stream the cumsum is a sort —
    at 100 TB the stream key becomes (source, shard) where shard is the
    ingest file, keeping every sort partition bounded while preserving
    within-shard document order (packing semantics are per-shard by
    construction in a sharded corpus).
    """
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offs = d.select(
        "source",
        "doc_id",
        n_tok.alias("n_tok"),
    ).withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        offs.groupBy(
            "source",
            F.floor(F.col("start_off") / _CTX_TOKENS).alias("pack_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "q_mix_report",
    oracle="""
WITH per AS (
  SELECT lang, source,
         count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(sum(length(text)) AS BIGINT) AS n_chars
  FROM documents
  GROUP BY lang, source
)
SELECT lang, source, n_docs, n_tokens, n_chars,
       round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS token_share
FROM per
""",
)
def q_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture report: docs/tokens/chars and token share per
    (lang, source) cell (north-star data-mixing input).

    The numbers that drive pretraining mixture weights (what fraction of
    the token budget each source contributes). Exact integer sums — the
    only float is the final share division over the already-aggregated
    cells. The global-total window runs over the *aggregated* frame
    (|lang|×|source| rows), so the single-partition exchange it implies
    is over a handful of rows at any corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    total = F.sum("n_tokens").over(W.partitionBy())
    return per.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_tokens") * F.lit(1.0) / total, 6).alias("token_share"),
    )
