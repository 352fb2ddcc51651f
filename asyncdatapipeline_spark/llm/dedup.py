"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2B B56-B57 + north-star extensions: exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup).

Scale doctrine: near-dup detection at 100 TB is always
*bucket-then-verify* — never an all-pairs comparison. MinHash banding and
SimHash prefix buckets bound candidate generation; the exact-Jaccard
verifier only runs inside buckets. The n-gram pair join carries a
hot-shingle suppression filter (a shingle shared by >100 docs generates
O(n²) candidate pairs and no dedup signal — the classic skew guardrail).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# B56 — exact dedup
# ---------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    oracle="""
SELECT
  md5(text) AS text_hash,
  min(doc_id) AS keep_id,
  count(*) AS dup_count
FROM documents
GROUP BY md5(text)
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup via content-hash groupBy (B56).

    Hash first, then group on the 128-bit digest: the shuffle carries
    32-byte keys instead of document bodies — at 100 TB that is the
    difference between shuffling hashes and shuffling the corpus.
    md5 is content-addressing here, not security.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# ---------------------------------------------------------------------------
# B57 — MinHash + LSH banding (rows-only: hash family is engine-specific)
# ---------------------------------------------------------------------------

_MINHASH_K = 16  # signature length
_BAND_ROWS = 2   # rows per band → 8 bands; P(candidate) = 1-(1-j^2)^8


def _shingle_array(col):
    """Distinct 3-word shingles — the MinHash token set.

    Bare words are a poor token set when the corpus vocabulary is small
    (every doc shares most words → every band bucket saturates); shingles
    keep the signal local and distinctive, matching the exact verifier
    (q_dedup_ngram).
    """
    w = F.split(col, " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - 2, F.lit(0))),
            lambda i: F.concat_ws(
                " ",
                F.element_at(w, i),
                F.element_at(w, i + 1),
                F.element_at(w, i + 2),
            ),
        )
    )


@query("q_dedup_minhash")  # rows-only: xxhash64 family has no DuckDB twin
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banded near-dup candidates (B57).

    shingle → k minhashes → band → bucket-join, all in built-in
    functions (no Python in the row path):

    1. explode distinct 3-word shingles, then signature[i] =
       min(xxhash64(shingle, seed=i)) as 16 grouped min-aggregates —
       map-side partial mins mean the shuffle is |docs|×16 longs, and no
       per-row array allocation happens (evaluating the shingle array
       once per seed via ``transform`` was 4× slower);
    2. split the signature into bands of 2, hash each band;
    3. explode bands → groupBy (band_idx, band_hash) → docs sharing a
       band bucket are candidate pairs (verified by q_dedup_ngram's exact
       Jaccard in a real pipeline).

    Emits one row per candidate pair with the number of shared bands.
    Per-bucket pair expansion is capped (bucket size > 50 dropped) — the
    LSH analogue of the hot-key guardrail.
    """
    d = load_table(spark, sf_dir, "documents")
    # The fixture corpus is one parquet file → one input partition; the
    # signature computation is CPU-bound (16 hashes × ~n_words shingles
    # per doc), so spread it across cores first. At 100 TB the input is
    # many files and this repartition is a no-op cost-wise.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    exploded = d.repartition(n_part, "doc_id").select(
        "doc_id", F.explode(_shingle_array(F.col("text"))).alias("shingle")
    )
    sig_row = exploded.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}")
            for i in range(_MINHASH_K)
        ]
    )
    sig = F.array(*[F.col(f"h{i}") for i in range(_MINHASH_K)])
    n_bands = _MINHASH_K // _BAND_ROWS
    banded = (
        sig_row.select("doc_id", sig.alias("sig"))
        .select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.xxhash64(
                                *[
                                    F.element_at("sig", b * _BAND_ROWS + r + 1)
                                    for r in range(_BAND_ROWS)
                                ]
                            ).alias("band_hash"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("band"),
        )
        .select("doc_id", "band.band_idx", "band.band_hash")
    )
    # One aggregation replaces the window-count + self-join (3 shuffles →
    # 1): collect each bucket's members, drop degenerate buckets (>50
    # docs — the hot-key guardrail), expand intra-bucket pairs with array
    # ops (sorted ids → a<b for free), then count shared bands per pair.
    ids = F.sort_array(F.collect_set("doc_id"))
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(ids.alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= 50))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_bands"))
    )
    return pairs.orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# SimHash (north star) — rows-only: hash family engine-specific
# ---------------------------------------------------------------------------


@query("q_dedup_simhash")
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document + 16-bit prefix bucket (north-star
    dedup family).

    Vectorized pandas UDF (Arrow batches): per doc, hash each word to 64
    bits (md5-derived — *not* Python's salted ``hash``), sum ±1 per bit,
    sign → fingerprint. Near-dups differ in few bits; the prefix bucket
    is the scale path (group by bucket, verify hamming distance within).
    """

    @F.pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        def one(t: str) -> int:
            if not t:
                return 0
            acc = [0] * 64
            for w in set(t.split(" ")):
                h = int.from_bytes(
                    hashlib.md5(w.encode()).digest()[:8], "big", signed=False
                )
                for bit in range(64):
                    acc[bit] += 1 if (h >> bit) & 1 else -1
            v = 0
            for bit in range(64):
                if acc[bit] > 0:
                    v |= 1 << bit
            # wrap to signed 64-bit for Spark LongType
            return v - (1 << 64) if v >= (1 << 63) else v

        return texts.map(one)

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        simhash("text").alias("simhash"),
        (F.shiftrightunsigned(simhash("text"), 48)).alias("bucket16"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (north star) — exact, oracle-checked
# ---------------------------------------------------------------------------

_JACCARD_THRESHOLD = 0.8
_HOT_SHINGLE_MAX_DOCS = 100


@query(
    "q_dedup_ngram",
    oracle=f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 2),
                i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
  FROM ws
),
cold AS (
  SELECT shingle FROM sh GROUP BY shingle
  HAVING count(*) <= {_HOT_SHINGLE_MAX_DOCS}
),
shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN cold USING (shingle)),
cnt AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       round(p.shared * 1.0 / (ca.n + cb.n - p.shared), 6) AS jaccard
FROM pairs p
JOIN cnt ca ON ca.doc_id = p.doc_a
JOIN cnt cb ON cb.doc_id = p.doc_b
WHERE p.shared * 1.0 / (ca.n + cb.n - p.shared) >= {_JACCARD_THRESHOLD}
""",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram (word-shingle) Jaccard near-dup pairs (north-star
    dedup family; the exact verifier behind MinHash candidates).

    Pipeline: shingle → distinct(doc, shingle) → *hot-shingle filter*
    (drop shingles in >{max} docs: they contribute O(n²) pairs and no
    signal — the skew guardrail that makes this viable at scale) →
    self-join on shingle → per-pair intersection count → Jaccard via
    inclusion-exclusion → threshold.
    """
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - 2, F.lit(0))),
            lambda i: F.concat_ws(
                " ",
                F.element_at(w, i),
                F.element_at(w, i + 1),
                F.element_at(w, i + 2),
            ),
        )
    )
    sh = d.select("doc_id", F.explode(shingles).alias("shingle"))
    cold = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _HOT_SHINGLE_MAX_DOCS)
        .select("shingle")
    )
    shc = sh.join(cold, "shingle")
    cnt = shc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = shc.alias("a")
    b = shc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    jac = F.col("shared") * 1.0 / (F.col("ca.n") + F.col("cb.n") - F.col("shared"))
    return (
        pairs.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (north star) — exact within a bounded id range
# ---------------------------------------------------------------------------

_COS_THRESHOLD = 0.95
_EMBED_ID_BOUND = 300  # bound the all-pairs region; scale path = LSH buckets


@query(
    "q_dedup_embed",
    oracle=f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {_EMBED_ID_BOUND}
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {_COS_THRESHOLD}
""",
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (north-star dedup family).

    Exact all-pairs cosine over a *bounded* id range (the honest baseline
    — an unbounded crossJoin of two 100 TB sides is a design bug; the
    scale path is the random-hyperplane bucketing of q_sim_ann, which
    reduces this to per-bucket all-pairs). Dot products run as a
    sequential double fold (``zip_with`` + ``aggregate``), matching
    DuckDB's double-cast ``list_cosine_similarity``; rounded to 6.
    """
    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _EMBED_ID_BOUND)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )

    def dot(u, v):
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    cos = dot(F.col("va"), F.col("vb")) / (
        F.sqrt(dot(F.col("va"), F.col("va"))) * F.sqrt(dot(F.col("vb"), F.col("vb")))
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim_raw", cos)
        .filter(F.col("cos_sim_raw") >= _COS_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )
