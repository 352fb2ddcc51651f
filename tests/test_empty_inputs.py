"""Empty-input robustness sweep: every registered query must execute
against empty (schema-identical) fixture tables without crashing.

At 100 TB, empty inputs are routine — an empty date partition, a source
with no documents today, a filter that matches nothing. An operator that
works on data but throws on its absence (first() on empty, seeding a
loop from a missing row, KMeans on zero vectors) is a production pager.
Aggregates-without-group correctly return their SQL identity row
(count=0, sum=NULL) rather than zero rows.

No exclusions: q_sim_ivf (formerly excluded — KMeans needs k ≤ n) now
guards on the missing query vector an empty corpus implies and returns
the empty result with the output schema, so it is swept like the rest.
"""

from __future__ import annotations

import pytest

from asyncdatapipeline_spark import registry
from asyncdatapipeline_spark.sources.tables import TABLES, load_table

EXCLUDED: set[str] = set()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.heavy
def test_every_query_survives_empty_inputs(spark, empty_sf_dir):
    failures = []
    for name, fn in registry.all_queries().items():
        if name in EXCLUDED:
            continue
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "queries crashed on empty inputs:\n" + "\n".join(failures)


@pytest.fixture(scope="module")
def nully_sf_dir(spark, sf_dir, tmp_path_factory):
    """Fixtures plus adversarial rows: null text, empty text, null
    embedding, empty embedding — the malformed records any 100 TB crawl
    contains."""
    out = tmp_path_factory.mktemp("nully_sf")
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        if t == "documents":
            extra = spark.createDataFrame(
                [
                    (99990, None, "en", "src0", 0),
                    (99991, "", "en", "src0", 0),
                    (99992, "   ", None, None, 3),
                    # multi-byte UTF-8: byte-length ≠ char-length paths
                    (99993, "héllo wörld 中文 emoji 🙂 done", "mix", "src1", 29),
                ],
                schema=df.schema,
            )
            df = df.unionByName(extra)
        if t == "embeddings":
            extra = spark.createDataFrame(
                [(99990, None, 0), (99991, [], 1)], schema=df.schema
            )
            df = df.unionByName(extra)
        df.write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


LLM_QUERIES = [
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram",
    "q_dedup_embed", "q_dedup_clusters", "q_sim_topk", "q_sim_ann",
    "q_text_stats", "q_text_lang", "q_text_quality", "q_text_tokens",
    "q_text_fingerprint", "q_text_winnow", "q_text_scrub", "q_text_chunk",
    "q_pack_sequences", "q_mix_report", "q_multimodal", "q_mm_frames",
    "q_mm_arrow", "q_mm_resize",
    # round-5 embedding family: null/empty embedding rows must not crash
    "q_dedup_semantic", "q_dedup_semantic_incremental", "q_sim_ivf",
    "q_dedup_embed_lsh", "q_mm_audio",
]


def test_llm_ops_survive_malformed_rows(spark, nully_sf_dir):
    failures = []
    for name in LLM_QUERIES:
        try:
            registry.get(name).fn(spark, nully_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "LLM ops crashed on malformed rows:\n" + "\n".join(failures)


MM_QUERIES = ["q_multimodal", "q_mm_frames", "q_mm_arrow", "q_mm_resize", "q_mm_audio"]


def test_mm_oracle_parity_on_multibyte_text(spark, nully_sf_dir):
    """The multimodal oracles must be BYTE-exact, not just ASCII-exact:
    frame/resize windows slice payload bytes, and the DuckDB twins slice
    the lowercase-hex form (2 chars/byte). The nully fixture's multi-byte
    row (é/ö/中文/🙂) breaks any char-counting substr oracle, so parity
    here proves the byte math, unlike the no-crash sweep above."""
    import duckdb

    from tools.check_oracle import canon_rows

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{nully_sf_dir}/{t}.parquet/*.parquet')"
        )
    for name in MM_QUERIES:
        qd = registry.get(name)
        sdf = qd.fn(spark, nully_sf_dir).toPandas()
        odf = con.sql(qd.oracle).df()
        scols, srows = canon_rows(sdf)
        ocols, orows = canon_rows(odf)
        assert scols == ocols, name
        assert srows == orows, name


def test_sink_partitioned_null_text_oracle_parity(spark, nully_sf_dir):
    """ADVICE r4: a NULL-text document must affect the partitioned-sink
    content checksum IDENTICALLY in both engines (F.concat
    NULL-propagates like the oracle's ||; concat_ws would silently hash
    just the id). The nully fixture's NULL-text row is the exact case."""
    import duckdb

    from tools.check_oracle import canon_rows

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{nully_sf_dir}/{t}.parquet/*.parquet')"
        )
    qd = registry.get("q_sink_partitioned")
    sdf = qd.fn(spark, nully_sf_dir).toPandas()
    odf = con.sql(qd.oracle).df()
    scols, srows = canon_rows(sdf)
    ocols, orows = canon_rows(odf)
    assert scols == ocols
    assert srows == orows
