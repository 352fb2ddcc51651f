"""Corpus-curation filters for LLM training-data pipelines (north-star
extensions beyond SURVEY.md §2B: benchmark decontamination, repetition
signals, deterministic train/valid/test splitting).

These are the passes a real pretraining pipeline runs between scoring
(llm/text.py) and packing (llm/packing.py):

- **decontamination**: drop corpus documents that overlap an evaluation
  benchmark (n-gram collision against the eval set) — leaving them in
  inflates downstream eval numbers. The eval set is tiny by construction,
  so at 100 TB this is a broadcast join against the corpus scan: the
  corpus never shuffles.
- **repetition signals**: Gopher-style intra-document repetition
  fractions (duplicate word-2-gram share, most-frequent-word share) —
  row-local codegen expressions, zero shuffle at any size.
- **hash split**: a stable md5-derived train/valid/test assignment —
  reproducible across engines, runs, and partitionings (never
  ``rand()``, which changes under retry/reorder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table
from asyncdatapipeline_spark.llm.dedup import _shingle_array

# Deterministic pseudo eval set: every 97th doc plays the benchmark. In
# production this is an external table of eval-suite documents; the
# modulus keeps the fixture self-contained while preserving the shape
# (tiny eval side vs. the full corpus).
_BENCH_MOD = 97
# A document sharing >= 10% of its 3-gram shingles with the eval set is
# flagged. (Real pipelines key on 8-13-gram collisions; the fixture docs
# are short, so 3-grams keep the test signal non-degenerate.)
_CONTAM_THRESHOLD = 0.10


@query(
    "q_text_decontam",
    oracle=f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 2),
                i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
  FROM ws WHERE len(w) >= 3
),
bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {_BENCH_MOD} = 0
),
corpus AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN len(list_distinct(list_transform(
                     generate_series(1, len(w) - 2),
                     i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])))
              ELSE 0 END AS n_shingles
  FROM ws WHERE doc_id % {_BENCH_MOD} != 0
),
hits AS (
  SELECT s.doc_id, count(*) AS n_hit
  FROM sh s JOIN bench b USING (shingle)
  WHERE s.doc_id % {_BENCH_MOD} != 0
  GROUP BY s.doc_id
)
SELECT c.doc_id, c.n_shingles,
       coalesce(h.n_hit, 0) AS n_hit,
       CASE WHEN c.n_shingles > 0
            THEN round(coalesce(h.n_hit, 0) * 1.0 / c.n_shingles, 6)
            ELSE 0.0 END AS contamination,
       CASE WHEN c.n_shingles > 0
            THEN coalesce(h.n_hit, 0) * 1.0 / c.n_shingles
                 >= {_CONTAM_THRESHOLD}
            ELSE FALSE END AS contaminated
FROM corpus c LEFT JOIN hits h USING (doc_id)
""",
)
def q_text_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per corpus doc, the fraction of its
    distinct 3-gram shingles that collide with the eval set's shingles
    (north-star curation family).

    The eval side is aggregated to a DISTINCT shingle set and broadcast
    — eval suites are KBs-to-MBs while the corpus is the 100 TB side, so
    the corpus streams through a broadcast hash join (no corpus shuffle,
    no skew surface). The per-doc hit count then aggregates on doc_id,
    which is the corpus's natural key — at scale that aggregation is
    map-side-combinable and never hot. Same shingle definition as the
    dedup family (llm/dedup.py _shingle_array), so one shingling pass
    can feed both at ingest.
    """
    d = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    sh = d.select("doc_id", F.explode(_shingle_array(F.col("text"))).alias("shingle"))
    bench = sh.filter(is_bench).select("shingle").distinct()
    corpus = d.filter(~is_bench).select(
        "doc_id", F.size(_shingle_array(F.col("text"))).alias("n_shingles")
    )
    hits = (
        sh.filter(~is_bench)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    frac = F.col("n_hit") / F.col("n_shingles")
    return (
        corpus.join(hits, "doc_id", "left")
        .withColumn("n_hit", F.coalesce("n_hit", F.lit(0)))
        .select(
            "doc_id",
            "n_shingles",
            "n_hit",
            F.when(F.col("n_shingles") > 0, F.round(frac, 6))
            .otherwise(0.0)
            .alias("contamination"),
            F.when(F.col("n_shingles") > 0, frac >= _CONTAM_THRESHOLD)
            .otherwise(F.lit(False))
            .alias("contaminated"),
        )
    )


# Gopher-style flag thresholds (Rae et al. 2021 use 0.2 for the
# top-2-gram fraction and a family of duplicate-n-gram caps; one pair of
# knobs is enough to demonstrate the shape).
_REP_TOP_WORD_MAX = 0.20
_REP_DUP_2GRAM_MAX = 0.30


@query(
    "q_text_repetition",
    oracle=f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, w, len(w) AS n,
         CASE WHEN len(w) >= 2
              THEN list_transform(generate_series(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i + 1])
              ELSE [] END AS g2
  FROM ws
),
m AS (
  SELECT doc_id, n,
         CASE WHEN len(g2) > 0
              THEN round(1.0 - len(list_distinct(g2)) * 1.0 / len(g2), 6)
              ELSE 0.0 END AS dup_2gram_frac,
         CASE WHEN n > 0
              THEN round(list_max(list_transform(list_distinct(w),
                     d -> len(list_filter(w, x -> x = d)))) * 1.0 / n, 6)
              ELSE 0.0 END AS top_word_frac
  FROM g
)
SELECT doc_id, n AS n_words, dup_2gram_frac, top_word_frac,
       (top_word_frac > {_REP_TOP_WORD_MAX}
        OR dup_2gram_frac > {_REP_DUP_2GRAM_MAX}) AS flagged_repetitive
FROM m
""",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals (Gopher-style quality filters):
    duplicate word-2-gram fraction and most-frequent-word fraction, with
    a combined flag (north-star curation family).

    Entirely row-local built-in expressions — one whole-stage-codegen
    projection over the corpus scan, zero shuffle at any size. The
    top-word count is an O(|vocab|·|words|) per-row fold, bounded by
    document length — CPU-parallel, never a memory risk.
    """
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    g2 = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dup2 = F.when(
        F.size(g2) > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(g2)) / F.size(g2), 6
        ),
    ).otherwise(0.0)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(w),
            lambda d_: F.size(F.filter(w, lambda x: x == d_)),
        )
    )
    topw = F.when(n > 0, F.round(top_cnt / n, 6)).otherwise(0.0)
    return d.select(
        "doc_id",
        n.alias("n_words"),
        dup2.alias("dup_2gram_frac"),
        topw.alias("top_word_frac"),
        (
            (topw > _REP_TOP_WORD_MAX) | (dup2 > _REP_DUP_2GRAM_MAX)
        ).alias("flagged_repetitive"),
    )


# 256-bucket md5 split: [0, 230) train / [230, 243) valid / [243, 256)
# test ≈ 89.8 / 5.1 / 5.1.
_SPLIT_TRAIN_LT = 230
_SPLIT_VALID_LT = 243


@query(
    "q_split_hash",
    oracle=f"""
SELECT doc_id,
       ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::UINTEGER AS bucket,
       CASE
         WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::UINTEGER
              < {_SPLIT_TRAIN_LT} THEN 'train'
         WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::UINTEGER
              < {_SPLIT_VALID_LT} THEN 'valid'
         ELSE 'test'
       END AS split
FROM documents
""",
)
def q_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment from md5(doc_id)'s
    first byte (north-star curation family).

    Hash-based splitting is the only correct way to split a distributed
    corpus: ``rand()`` re-rolls under task retry and changes with
    partitioning, ``row_number`` imposes a global sort. The md5 byte is
    stable across engines (the oracle recomputes it bit-for-bit), runs,
    partition counts, and future corpus appends — a doc's split never
    changes when the corpus grows, which is what keeps eval sets
    uncontaminated across dataset versions. Map-only codegen; at scale
    the split column is written at ingest and downstream reads partition
    on it.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < _SPLIT_TRAIN_LT, "train")
        .when(bucket < _SPLIT_VALID_LT, "valid")
        .otherwise("test")
        .alias("split"),
    )
