"""Semantic tests for the LLM-pipeline operators (SURVEY.md §2B B56-B60).

The rows-only registry queries (minhash, simhash, ann, winnow) get their
correctness evidence here: plant near-duplicates, assert the operator
finds them (and doesn't drown them in false positives); assert ANN recall
against the exact brute-force baseline.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from asyncdatapipeline_spark import registry
from asyncdatapipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def planted_docs(spark, sf_dir, tmp_path_factory):
    """Fixture docs + planted near-duplicates written to a scratch sf dir
    (documents.parquet only) so registry queries can run against it."""
    out = tmp_path_factory.mktemp("planted")
    d = load_table(spark, sf_dir, "documents")
    # near-dup: longest doc with ONE word mutated (a one-word edit on a
    # short doc legitimately falls below the 0.8 Jaccard threshold —
    # 3 of ~20 shingles change); exact dup of doc 1.
    base = (
        d.withColumn("nw", F.size(F.split("text", " ")))
        .orderBy(F.col("nw").desc(), "doc_id")
        .first()
    )
    doc1 = d.filter(F.col("doc_id") == 1).first()
    words = base["text"].split(" ")
    words[len(words) // 2] = "MUTATED"
    near = (9000, " ".join(words), base["lang"], base["source"], base["n_chars"])
    exact = (9001, doc1["text"], doc1["lang"], doc1["source"], doc1["n_chars"])
    extra = spark.createDataFrame([near, exact], schema=d.schema)
    d.unionByName(extra).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )
    return str(out), base["doc_id"]


def test_exact_dedup_finds_planted_dup(spark, planted_docs):
    pdir, base_id = planted_docs
    res = registry.get("q_dedup_exact").fn(spark, pdir).collect()
    dup_groups = [r for r in res if r["dup_count"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups[0]["keep_id"] == 1  # min(doc_id) of {1, 9001}


def test_minhash_finds_planted_near_dup(spark, planted_docs):
    pdir, base_id = planted_docs
    pairs = registry.get("q_dedup_minhash").fn(spark, pdir).collect()
    assert any(
        {r["doc_a"], r["doc_b"]} == {base_id, 9000} for r in pairs
    ), "planted near-dup pair not in MinHash candidates"
    assert any({r["doc_a"], r["doc_b"]} == {1, 9001} for r in pairs)


def test_ngram_jaccard_scores_planted_pair(spark, planted_docs):
    pdir, base_id = planted_docs
    pairs = registry.get("q_dedup_ngram").fn(spark, pdir).collect()
    hit = [r for r in pairs if {r["doc_a"], r["doc_b"]} == {base_id, 9000}]
    assert hit, "planted near-dup not above Jaccard threshold"
    assert 0.8 <= hit[0]["jaccard"] < 1.0
    exact_hit = [r for r in pairs if {r["doc_a"], r["doc_b"]} == {1, 9001}]
    assert exact_hit and exact_hit[0]["jaccard"] == 1.0


def test_simhash_hamming_close_for_near_dup(spark, planted_docs):
    pdir, base_id = planted_docs
    rows = {
        r["doc_id"]: r["simhash"]
        for r in registry.get("q_dedup_simhash").fn(spark, pdir).collect()
    }
    ham = bin((rows[base_id] ^ rows[9000]) & ((1 << 64) - 1)).count("1")
    assert ham <= 16, f"near-dup simhash hamming distance too large: {ham}"
    assert rows[1] == rows[9001]  # identical text → identical fingerprint


def test_fast_hash_mode_preserves_dedup_semantics(spark, planted_docs, monkeypatch):
    """SPARK_GRAFT_HASH=xxhash64 (the production-ingest knob) changes the
    base hash, not the semantics: MinHash still surfaces the planted
    pairs and SimHash fingerprints stay identical for identical text and
    hamming-close for near-dups. (No oracle in this mode — DuckDB can't
    recompute xxhash64; CORRECTNESS runs keep the md5 default.)"""
    monkeypatch.setenv("SPARK_GRAFT_HASH", "xxhash64")
    pdir, base_id = planted_docs
    pairs = registry.get("q_dedup_minhash").fn(spark, pdir).collect()
    assert any({r["doc_a"], r["doc_b"]} == {base_id, 9000} for r in pairs)
    assert any({r["doc_a"], r["doc_b"]} == {1, 9001} for r in pairs)
    rows = {
        r["doc_id"]: r["simhash"]
        for r in registry.get("q_dedup_simhash").fn(spark, pdir).collect()
    }
    assert rows[1] == rows[9001]
    ham = bin((rows[base_id] ^ rows[9000]) & ((1 << 64) - 1)).count("1")
    assert ham <= 16


def test_fast_hash_mode_rejects_unknown_value(monkeypatch):
    from asyncdatapipeline_spark.llm.dedup import _hash_mode

    monkeypatch.setenv("SPARK_GRAFT_HASH", "sha1")
    with pytest.raises(ValueError, match="SPARK_GRAFT_HASH"):
        _hash_mode()


def test_winnow_overlap_for_near_dup(spark, planted_docs):
    pdir, base_id = planted_docs
    rows: dict[int, set[int]] = {}
    for r in registry.get("q_text_winnow").fn(spark, pdir).collect():
        rows.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    a, b = rows[base_id], rows[9000]
    overlap = len(a & b) / max(len(a | b), 1)
    assert overlap >= 0.5, f"winnow fingerprint overlap too low: {overlap}"
    assert rows[1] == rows[9001]


@pytest.fixture(scope="module")
def planted_curation(spark, sf_dir, tmp_path_factory):
    """Scratch corpus for the curation filters: a doc that copies a
    benchmark doc's text (decontam must flag it) and a degenerate
    repeated-word doc (repetition must flag it)."""
    out = tmp_path_factory.mktemp("curation")
    d = load_table(spark, sf_dir, "documents")
    bench0 = d.filter(F.col("doc_id") == 0).first()  # 0 % 97 == 0 → benchmark
    contaminated = (9002, bench0["text"], bench0["lang"], bench0["source"], bench0["n_chars"])
    spammy = (9003, " ".join(["spam"] * 30), "en", "synthetic", 149)
    extra = spark.createDataFrame([contaminated, spammy], schema=d.schema)
    d.unionByName(extra).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )
    return str(out)


def test_decontam_flags_benchmark_copy(spark, planted_curation):
    rows = {
        r["doc_id"]: r
        for r in registry.get("q_text_decontam").fn(spark, planted_curation).collect()
    }
    assert 0 not in rows  # benchmark docs are not scored
    hit = rows[9002]
    assert hit["contaminated"] and hit["contamination"] == 1.0
    # the spam doc shares nothing with the eval set
    assert not rows[9003]["contaminated"]


def test_repetition_flags_degenerate_doc(spark, planted_curation):
    rows = {
        r["doc_id"]: r
        for r in registry.get("q_text_repetition").fn(spark, planted_curation).collect()
    }
    spam = rows[9003]
    assert spam["flagged_repetitive"]
    # 30x "spam": 29 bigrams, 1 distinct -> 1 - 1/29
    assert spam["top_word_frac"] == 1.0 and spam["dup_2gram_frac"] > 0.9
    flagged = sum(1 for r in rows.values() if r["flagged_repetitive"])
    assert flagged < len(rows) * 0.2, "repetition filter flags most of the corpus"


def test_split_hash_deterministic_and_proportional(spark, sf_dir):
    fn = registry.get("q_split_hash").fn
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in fn(spark, sf_dir).collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"]) for r in fn(spark, sf_dir).collect()}
    assert a == b  # stable across runs (hash, not rand)
    n = len(a)
    shares = {
        s: sum(1 for _, sp in a.values() if sp == s) / n
        for s in ("train", "valid", "test")
    }
    assert 0.80 <= shares["train"] <= 0.97
    assert 0.01 <= shares["valid"] <= 0.12
    assert 0.01 <= shares["test"] <= 0.12


@pytest.fixture(scope="module")
def planted_embeds(spark, sf_dir, tmp_path_factory):
    """Scratch embeddings with an exact-duplicate vector planted — an
    identical vector lands in the same LSH bucket by construction."""
    out = tmp_path_factory.mktemp("embeds")
    e = load_table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") == 5).first()
    dup = (9000, base["embedding"], base["label"])
    extra = spark.createDataFrame([dup], schema=e.schema)
    e.unionByName(extra).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )
    return str(out)


def test_embed_lsh_finds_planted_duplicate(spark, planted_embeds):
    pairs = registry.get("q_dedup_embed_lsh").fn(spark, planted_embeds).collect()
    hit = [r for r in pairs if {r["vec_a"], r["vec_b"]} == {5, 9000}]
    assert hit, "identical planted vector not found by LSH-bucketed dedup"
    assert hit[0]["cos_sim"] == 1.0


def test_ann_recall_vs_brute_force(spark, sf_dir):
    exact = {
        r["vec_id"]
        for r in registry.get("q_sim_topk").fn(spark, sf_dir).collect()
    }
    approx = {
        r["vec_id"] for r in registry.get("q_sim_ann").fn(spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall {recall} below floor"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    exact = [
        r["vec_id"]
        for r in registry.get("q_sim_topk").fn(spark, sf_dir).collect()
    ]
    approx = {
        r["vec_id"] for r in registry.get("q_sim_ivf").fn(spark, sf_dir).collect()
    }
    recall = len(set(exact) & approx) / len(exact)
    # nprobe/nlist = 3/8 of the corpus scanned; near-isotropic fixture
    # vectors → recall ≈ fraction probed is the honest floor. The Lloyd
    # round sustains far above it here (0.95 measured at sf0.001/0.01).
    assert recall >= 0.3, f"IVF recall {recall} below floor"


def test_ivf_lloyd_round_improves_clustered_recall(spark, tmp_path_factory):
    """The Lloyd refinement must EARN its build pass: on a corpus with
    real cluster structure (where the fixture's near-isotropic vectors
    can't show it), one round moves the seed centroids onto the true
    clusters and recall over the probed cells beats the seed-only
    quantizer. Deterministic data → deterministic margin."""
    import numpy as np

    from asyncdatapipeline_spark import registry
    from asyncdatapipeline_spark.llm import similarity as S

    rng = np.random.default_rng(7)
    centers = rng.normal(0, 10.0, size=(4, 16))
    rows = []
    # vec_id 0 is the query; ids are assigned so the SEEDS (the 8
    # smallest ids) all land in cluster 0 — the worst case seed draw
    # that only a refinement round can recover from.
    vid = 0
    for ci in range(4):
        for k in range(50):
            v = centers[ci] + rng.normal(0, 0.5, size=16)
            rows.append((vid, f"c{ci}", [float(x) for x in v]))
            vid += 1
    out = tmp_path_factory.mktemp("ivf_clustered")
    spark.createDataFrame(
        rows, "vec_id BIGINT, label STRING, embedding ARRAY<DOUBLE>"
    ).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))
    sf = str(out)

    def recall(centroids) -> float:
        key = (spark.sparkContext.applicationId, sf)
        S._IVF_CACHE[key] = centroids
        try:
            exact = [
                r["vec_id"]
                for r in registry.get("q_sim_topk").fn(spark, sf).collect()
            ]
            approx = {
                r["vec_id"]
                for r in registry.get("q_sim_ivf").fn(spark, sf).collect()
            }
            return len(set(exact) & approx) / len(exact)
        finally:
            S._IVF_CACHE.pop(key, None)

    import pyspark.sql.functions as F

    e = load_table(spark, sf, "embeddings").withColumn(
        "v", S._as_double(F.col("embedding"))
    )
    seeds = [
        [float(x) for x in r["v"]]
        for r in e.select("vec_id", "v").orderBy("vec_id").limit(S._IVF_NLIST).collect()
    ]
    refined = S._ivf_centroids(spark, sf, e)
    S._IVF_CACHE.pop((spark.sparkContext.applicationId, sf), None)
    r_seed, r_refined = recall(seeds), recall(refined)
    assert r_refined > r_seed, (
        f"Lloyd round did not improve clustered recall: {r_refined} vs {r_seed}"
    )
    # All 8 seeds start inside the query's cluster, so after one round
    # that cluster still splits across ~5 refined cells and nprobe=3
    # cannot cover them all — 0.9 is structurally unreachable in one
    # round; 0.6 is the honest floor for this geometry (0.75 measured).
    assert r_refined >= 0.6, f"refined recall {r_refined} below clustered floor"


def test_frame_sampler_shape(spark, sf_dir):
    rows = registry.get("q_mm_frames").fn(spark, sf_dir).collect()
    assert rows, "no frames sampled"
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        assert r["frame_idx"] % 4 == 0
        assert len(r["frame_checksum"]) == 32
    # at least one doc long enough to yield multiple sampled frames
    assert any(len(v) > 1 for v in by_doc.values())


def test_multimodal_stub_deterministic(spark, sf_dir):
    from asyncdatapipeline_spark.llm.multimodal import decode_image_stub

    a = decode_image_stub(b"some media payload")
    b = decode_image_stub(b"some media payload")
    assert a == b
    res = registry.get("q_multimodal").fn(spark, sf_dir).limit(5).collect()
    for r in res:
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
        assert len(r["checksum"]) == 32


def test_dedup_clusters_merge_planted_dups(spark, planted_docs):
    pdir, base_id = planted_docs
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in registry.get("q_dedup_clusters").fn(spark, pdir).collect()
    }
    # both planted pairs collapse into one cluster each
    assert labels[1] == labels[9001] == 1          # exact dup, rep = min id
    assert labels[base_id] == labels[9000] == min(base_id, 9000)
    # representative flag: exactly one per cluster
    rows = registry.get("q_dedup_clusters").fn(spark, pdir).collect()
    reps = {}
    for r in rows:
        reps.setdefault(r["cluster_id"], 0)
        reps[r["cluster_id"]] += int(r["is_representative"])
    assert all(v == 1 for v in reps.values())


def test_connected_components_chain(spark):
    """A path graph a-b-c-d must collapse to ONE component — catches the
    classic one-hop-only bug that leaves chains split."""
    from asyncdatapipeline_spark.llm.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert labels[1] == labels[2] == labels[3] == labels[4] == 1
    assert labels[10] == labels[11] == 10


def test_pack_sequences_partition_of_corpus(spark, sf_dir):
    """Packing is a partition of the corpus: every document lands in
    exactly one pack, per-source pack ids are contiguous from 0, and a
    pack p > 0 only starts once ≥ 512·p tokens precede it."""
    docs = load_table(spark, sf_dir, "documents")
    packs = registry.get("q_pack_sequences").fn(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in packs) == docs.count()
    per_source: dict[str, list] = {}
    for r in packs:
        per_source.setdefault(r["source"], []).append(r)
    for source, rows in per_source.items():
        rows.sort(key=lambda r: r["pack_id"])
        assert [r["pack_id"] for r in rows] == list(range(len(rows)))
        cum = 0
        for r in rows:
            assert cum >= 512 * r["pack_id"]
            cum += r["pack_tokens"]


def test_mix_report_shares_sum_to_one(spark, sf_dir):
    rows = registry.get("q_mix_report").fn(spark, sf_dir).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    assert all(r["n_tokens"] > 0 and r["n_docs"] > 0 for r in rows)


def test_curation_full_matches_python_reference(spark, planted_curation):
    """q_curation_full vs a from-scratch Python reimplementation of all
    six stages on the planted corpus — catches any stage-order or
    stage-rule drift the SQL oracle (same-author) could share."""
    import hashlib
    from collections import Counter

    rows = registry.get("q_curation_full").fn(spark, planted_curation).collect()
    got = {
        (r["source"], r["pack_id"]): (
            r["n_docs"], r["pack_tokens"], r["first_doc"], r["last_doc"]
        )
        for r in rows
    }

    docs = sorted(
        load_table(spark, planted_curation, "documents").collect(),
        key=lambda r: r["doc_id"],
    )
    stop = {"the", "a", "of", "and", "in"}

    def shingles(text):
        w = text.split(" ")
        return set(
            f"{w[i]} {w[i+1]} {w[i+2]}" for i in range(len(w) - 2)
        ) if len(w) >= 3 else set()

    bench_sh = set()
    for r in docs:
        if r["doc_id"] % 97 == 0:
            bench_sh |= shingles(r["text"])

    survivors, seen_hash = [], set()
    for r in docs:
        if r["doc_id"] % 97 == 0:
            continue
        w = r["text"].split(" ")
        nw = len(w)
        if not (20 <= nw <= 1000):
            continue
        sr = sum(1 for x in w if x in stop) / nw
        if not (0.001 <= sr <= 0.6):
            continue
        sh = shingles(r["text"])
        if sh and len(sh & bench_sh) / len(sh) >= 0.10:
            continue
        g2 = [f"{a} {b}" for a, b in zip(w, w[1:])]
        dup2 = round(1.0 - len(set(g2)) / len(g2), 6) if g2 else 0.0
        topw = round(max(Counter(w).values()) / nw, 6)
        if topw > 0.20 or dup2 > 0.30:
            continue
        h = hashlib.md5(r["text"].encode()).hexdigest()
        if h in seen_hash:
            continue
        seen_hash.add(h)
        if int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2], 16) >= 230:
            continue
        survivors.append((r["source"], r["doc_id"], nw))

    exp: dict = {}
    offs: dict = {}
    for source, doc_id, nw in survivors:  # doc_id-sorted within source
        start = offs.get(source, 0)
        pack = (source, start // 512)
        n, tok, first, last = exp.get(pack, (0, 0, doc_id, doc_id))
        exp[pack] = (n + 1, tok + nw, min(first, doc_id), max(last, doc_id))
        offs[source] = start + nw

    assert got == exp


def test_embed_lsh_multi_table_closes_recall_gap(spark, sf_dir, tmp_path_factory):
    """Craft a near-dup by reflecting a corpus vector through its
    weakest table-0 hyperplane: the table-0 signatures then differ by
    construction (single-table provably misses the pair) while tables
    1-2 still bucket them together — embed_lsh_pairs(n_tables=3) must
    find what n_tables=1 cannot."""
    import math

    from asyncdatapipeline_spark.llm.dedup import (
        _EMBED_LSH_BITS, _EMBED_LSH_THRESHOLD, embed_lsh_pairs)
    from asyncdatapipeline_spark.llm.similarity import _plane_sign

    e = load_table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") == 5).first()
    v = [float(x) for x in base["embedding"]]
    dim = len(v)

    def planes(t):
        return [
            [_plane_sign(t * _EMBED_LSH_BITS + i, j) for j in range(dim)]
            for i in range(_EMBED_LSH_BITS)
        ]

    def sig(t, vec):
        s = 0
        for i, p in enumerate(planes(t)):
            acc = 0.0
            for pj, xj in zip(p, vec):
                acc += pj * xj
            if acc >= 0:
                s |= 1 << i
        return s

    cand = None
    for p in planes(0):
        dotp = sum(pj * xj for pj, xj in zip(p, v))
        u = [xj - 2.0 * (dotp / dim) * pj for pj, xj in zip(p, v)]
        cosuv = sum(a * b for a, b in zip(u, v)) / (
            math.sqrt(sum(a * a for a in u)) * math.sqrt(sum(b * b for b in v))
        )
        if (
            sig(0, u) != sig(0, v)
            and (sig(1, u) == sig(1, v) or sig(2, u) == sig(2, v))
            and cosuv >= _EMBED_LSH_THRESHOLD
        ):
            cand = u
            break
    assert cand is not None, "fixture geometry changed: no adversarial reflection found"

    out = tmp_path_factory.mktemp("multilsh")
    extra = spark.createDataFrame([(9100, cand, base["label"])], schema=e.schema)
    e.unionByName(extra).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )
    single = embed_lsh_pairs(spark, str(out), n_tables=1).collect()
    multi = embed_lsh_pairs(spark, str(out), n_tables=3).collect()
    assert not any({r["vec_a"], r["vec_b"]} == {5, 9100} for r in single), (
        "single-table unexpectedly found the cross-bucket pair"
    )
    hit = [r for r in multi if {r["vec_a"], r["vec_b"]} == {5, 9100}]
    assert hit, "multi-table LSH failed to recover the planted near-dup"
    assert hit[0]["cos_sim"] >= _EMBED_LSH_THRESHOLD


@pytest.fixture(scope="module")
def planted_incremental(spark, sf_dir, tmp_path_factory):
    """Scratch corpus with a cross-batch near-dup planted: store doc
    9001 (% 5 != 0) and its one-word-mutated copy 9010 (% 5 == 0, i.e.
    in the NEW batch)."""
    out = tmp_path_factory.mktemp("incr")
    d = load_table(spark, sf_dir, "documents")
    base = (
        d.withColumn("nw", F.size(F.split("text", " ")))
        .orderBy(F.col("nw").desc(), "doc_id")
        .first()
    )
    words = base["text"].split(" ")
    words[len(words) // 2] = "MUTATED"
    store_doc = (9001, base["text"], base["lang"], base["source"], base["n_chars"])
    batch_dup = (9010, " ".join(words), base["lang"], base["source"], base["n_chars"])
    extra = spark.createDataFrame([store_doc, batch_dup], schema=d.schema)
    d.unionByName(extra).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )
    return str(out)


def test_incremental_dedup_finds_cross_batch_dup(spark, planted_incremental):
    """A new-batch doc near-identical to a STORE doc must surface as a
    candidate pair — the daily-drop dedup call the within-corpus ops
    cannot make (q_dedup_minhash over only the batch would miss it)."""
    pairs = (
        registry.get("q_dedup_incremental")
        .fn(spark, planted_incremental)
        .collect()
    )
    assert any(
        r["new_doc_id"] == 9010 and r["store_doc_id"] == 9001 for r in pairs
    ), "planted cross-batch near-dup not found against the signature store"
    # Direction is strict: pairs are (batch, store), never store-internal.
    assert all(r["new_doc_id"] % 5 == 0 for r in pairs)
    assert all(r["store_doc_id"] % 5 != 0 for r in pairs)


def test_signature_store_reused_across_calls(spark, planted_incremental):
    """Second call must reuse the persisted store table (ingest cost is
    paid once per corpus, not per batch)."""
    from asyncdatapipeline_spark.llm.dedup import ensure_signature_store

    t1 = ensure_signature_store(spark, planted_incremental)
    t2 = ensure_signature_store(spark, planted_incremental)
    assert t1 == t2 and spark.catalog.tableExists(t1)


@pytest.fixture(scope="module")
def planted_boilerplate(spark, sf_dir, tmp_path_factory):
    """Six otherwise-distinct docs sharing one boilerplate footer, plus
    one doc that is ONLY the footer."""
    out = tmp_path_factory.mktemp("boiler")
    d = load_table(spark, sf_dir, "documents")
    footer = (
        "standard legal footer all rights reserved contact admin "
        "for details"
    )
    bases = [r["text"] for r in d.orderBy("doc_id").limit(6).collect()]
    extra_rows = [
        (9100 + i, f"{t} {footer}", "en", "srcX", None)
        for i, t in enumerate(bases)
    ] + [(9110, footer, "en", "srcX", None)]
    extra = spark.createDataFrame(extra_rows, schema=d.schema)
    d.unionByName(extra).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )
    return str(out)


def test_chunk_dedup_catches_boilerplate_doc_level_misses(
    spark, planted_boilerplate
):
    """The dominant web-corpus duplication mode: a footer repeated across
    distinct documents. Whole-document dedup sees 7 unique hashes;
    chunk-level dedup flags the shared chunks."""
    exact = (
        registry.get("q_dedup_exact").fn(spark, planted_boilerplate).collect()
    )
    planted_hashes = [
        r for r in exact if r["keep_id"] >= 9100 and r["dup_count"] > 1
    ]
    assert planted_hashes == [], "planted docs are all distinct doc-level"

    chunk = {
        r["doc_id"]: r
        for r in registry.get("q_dedup_chunk")
        .fn(spark, planted_boilerplate)
        .collect()
    }
    # The footer is 10 words → 8 footer-internal shingles, each in 7
    # docs ≥ the boilerplate threshold (5).
    for i in range(6):
        assert chunk[9100 + i]["n_boiler"] >= 8, (
            f"doc {9100 + i}: footer chunks not flagged as boilerplate"
        )
    # The footer-only doc is ~all boilerplate → flagged.
    assert chunk[9110]["flagged"], "pure-boilerplate doc not flagged"
    assert chunk[9110]["boiler_frac"] == 1.0


@pytest.fixture(scope="module")
def planted_images(spark, sf_dir, tmp_path_factory):
    """Two near-identical media payloads (one byte differs) + the fixture
    corpus as unrelated background."""
    out = tmp_path_factory.mktemp("phash")
    d = load_table(spark, sf_dir, "documents")
    base = "x" * 40 + "PIXELDATA" * 20  # 220-byte fake image
    mutated = base[:100] + "Q" + base[101:]  # one "pixel" changed
    extra = spark.createDataFrame(
        [(9200, base, "en", "img", None), (9201, mutated, "en", "img", None)],
        schema=d.schema,
    )
    d.unionByName(extra).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )
    return str(out)


def test_phash_near_identical_images_pair_up(spark, planted_images):
    """One changed byte must leave the fingerprints within the Hamming
    threshold and in the same prefix bucket; the pair must surface from
    the bucket-join without any all-pairs comparison."""
    from asyncdatapipeline_spark.llm.multimodal import phash_pairs

    fp = registry.get("q_mm_phash").fn(spark, planted_images)
    rows = {r["doc_id"]: r for r in fp.collect()}
    assert rows[9200]["bucket16"] == rows[9201]["bucket16"]
    xor = rows[9200]["phash"] ^ rows[9201]["phash"]
    assert bin(xor & ((1 << 64) - 1)).count("1") <= 10

    pairs = phash_pairs(fp).collect()
    assert any(
        (r["doc_a"], r["doc_b"]) == (9200, 9201) for r in pairs
    ), "planted near-identical image pair not found via bucket-join"


def test_phash_stub_locality(spark):
    """The stub must preserve dHash's locality property: a one-byte edit
    moves few bits, unrelated payloads move ~half."""
    from asyncdatapipeline_spark.llm.multimodal import phash_stub

    base = bytes(range(200))
    near = bytes([*range(100), 7, *range(101, 200)])
    far = bytes((i * 37 + 11) % 256 for i in range(200))
    h = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert h(phash_stub(base), phash_stub(near)) <= 10
    assert h(phash_stub(base), phash_stub(far)) >= 16


def test_signature_store_append_lifecycle(spark, sf_dir, tmp_path_factory):
    """The write half of incremental dedup: drop 1 passes the gate and
    its signatures append into the store; drop 2 (a near-copy of a
    drop-1 doc) must then collide with the drop-1 doc — which the
    pre-append store could not know about."""
    from asyncdatapipeline_spark.llm.dedup import (
        _band_key_rows,
        append_to_signature_store,
        ensure_signature_store,
    )

    out = tmp_path_factory.mktemp("lifecycle")
    d = load_table(spark, sf_dir, "documents")
    base = (
        d.withColumn("nw", F.size(F.split("text", " ")))
        .orderBy(F.col("nw").desc(), "doc_id")
        .first()
    )
    pdir = str(out)
    d.write.mode("overwrite").parquet(str(out / "documents.parquet"))

    store_tbl = ensure_signature_store(spark, pdir)
    n_before = spark.table(store_tbl).count()

    # Drop 1: a new doc (id 20001 — not in the %5 store split's id
    # space) whose signatures get appended after "passing" dedup.
    drop1 = spark.createDataFrame(
        [(20001, base["text"], base["lang"], base["source"], base["n_chars"])],
        schema=d.schema,
    )
    append_to_signature_store(spark, pdir, drop1)
    assert spark.table(store_tbl).count() > n_before

    # Drop 2: near-copy of the drop-1 doc. Its band keys must now hit
    # the appended signatures.
    words = base["text"].split(" ")
    words[len(words) // 2] = "MUTATED"
    drop2 = spark.createDataFrame(
        [(20010, " ".join(words), base["lang"], base["source"], base["n_chars"])],
        schema=d.schema,
    )
    batch = _band_key_rows(drop2, spark)
    store = spark.table(store_tbl)
    hits = (
        batch.alias("b")
        .join(store.alias("s"), F.col("b.band_key") == F.col("s.band_key"))
        .filter(F.col("s.doc_id") == 20001)
        .count()
    )
    assert hits > 0, "drop-2 near-dup did not collide with appended drop-1 signatures"

    # The append marks the store as diverged from its pure oracle replay
    # (appended doc_ids are invisible to the DuckDB rebuild) — the
    # _APPENDED marker is how tools detect that oracle verification no
    # longer applies to this corpus's store.
    from asyncdatapipeline_spark.operators.layout import _LAYOUT_DIR

    assert (_LAYOUT_DIR / store_tbl / "_APPENDED").exists()


def test_semantic_dedup_flags_planted_near_dups(spark, tmp_path_factory):
    """The fixture's isotropic vectors never clear the SemDeDup cosine
    threshold (max within-cell cosine ~0.5), so the sweep only proves
    plumbing; this plants true near-duplicates and asserts the flag and
    the keep-lowest-id survivor rule."""
    import numpy as np

    from asyncdatapipeline_spark import registry
    from asyncdatapipeline_spark.llm import similarity as S

    rng = np.random.default_rng(11)
    rows = []
    for vid in range(40):
        rows.append((vid, "base", [float(x) for x in rng.normal(0, 1, 16)]))
    # plant: 100 and 101 are tiny perturbations of vector 3 — all three
    # should land in one cell; 100/101 flagged, 3 survives (lowest id)
    base = np.array(rows[3][2])
    for vid in (100, 101):
        v = base + rng.normal(0, 0.01, 16)
        rows.append((vid, "dup", [float(x) for x in v]))
    out = tmp_path_factory.mktemp("semdedup")
    spark.createDataFrame(
        rows, "vec_id BIGINT, label STRING, embedding ARRAY<DOUBLE>"
    ).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))
    sf = str(out)
    S._IVF_CACHE.pop((spark.sparkContext.applicationId, sf), None)
    res = {
        r["vec_id"]: r
        for r in registry.get("q_dedup_semantic").fn(spark, sf).collect()
    }
    assert len(res) == 42
    assert not res[3]["is_semdup"], "survivor (lowest id) was flagged"
    assert res[100]["is_semdup"] and res[101]["is_semdup"]
    assert res[101]["n_near"] >= 2  # near both 3 and 100
    assert not any(
        r["is_semdup"] for vid, r in res.items() if vid not in (100, 101)
    )


def test_corpus_overlap_detects_planted_recrawl(spark, sf_dir, tmp_path_factory):
    """The fixture's sources share no content (0 overlap rows — both
    engines agree on the empty report), so plant a re-crawl: a new
    source that copies half of src0's documents must surface with the
    exact shared count and Jaccard."""
    from asyncdatapipeline_spark import registry

    d = load_table(spark, sf_dir, "documents")
    src0 = d.filter(F.col("source") == "src0")
    n0 = src0.count()
    recrawl = (
        src0.filter(F.col("doc_id") % 2 == 0)
        .withColumn("doc_id", F.col("doc_id") + 50000)
        .withColumn("source", F.lit("src_recrawl"))
    )
    out = tmp_path_factory.mktemp("overlap")
    d.unionByName(recrawl).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )
    rows = registry.get("q_dedup_corpus_overlap").fn(spark, str(out)).collect()
    hit = [r for r in rows if {r["source_a"], r["source_b"]} == {"src0", "src_recrawl"}]
    assert len(hit) == 1, rows
    r = hit[0]
    n_re = recrawl.count()
    assert r["n_shared"] == n_re and r["n_a"] == n0
    assert abs(r["jaccard"] - n_re / n0) < 1e-6
    # no other pair shares anything
    assert len(rows) == 1


def test_incremental_recap_only_after_append(spark, sf_dir, tmp_path_factory):
    """Round-6 perf fix: the read-time hot-bucket re-cap window runs ONLY
    on appended stores (the _APPENDED marker). On a never-appended store
    every bucket was capped at ingest so the window is a no-op — skipping
    it removes the per-read window CPU the round-5 bench measured (+18%).
    After an append floods a bucket past _BUCKET_CAP, the cap must
    re-engage and suppress the hot bucket's candidate pairs."""
    from asyncdatapipeline_spark import registry
    from asyncdatapipeline_spark.llm.dedup import (
        _BUCKET_CAP,
        append_to_signature_store,
    )

    out = tmp_path_factory.mktemp("recap")
    d = load_table(spark, sf_dir, "documents")
    pdir = str(out)
    d.write.mode("overwrite").parquet(str(out / "documents.parquet"))

    fn = registry.get("q_dedup_incremental").fn
    plan_before = fn(spark, pdir)._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan_before, "never-appended store must skip the re-cap window"

    # Flood: > _BUCKET_CAP identical docs — their shared band keys blow
    # past the cap once appended.
    base = (
        d.withColumn("nw", F.size(F.split("text", " ")))
        .orderBy(F.col("nw").desc(), "doc_id")
        .first()
    )
    flood = spark.createDataFrame(
        [
            (30000 + i, base["text"], base["lang"], base["source"], base["n_chars"])
            for i in range(_BUCKET_CAP + 10)
        ],
        schema=d.schema,
    )
    append_to_signature_store(spark, pdir, flood)

    df_after = fn(spark, pdir)
    plan_after = df_after._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" in plan_after, "appended store must re-apply the cap"
    hot_pairs = df_after.filter(F.col("store_doc_id") >= 30000).count()
    assert hot_pairs == 0, "flooded bucket's pairs must be suppressed by the re-cap"


def test_containment_flags_planted_excerpt(spark, tmp_path_factory):
    """q_text_containment semantics: a document that IS a slice of a
    longer host must be flagged with containment 1.0 and the correct
    orientation (excerpt = smaller side), while an unrelated doc of
    similar size must not pair with either."""
    from asyncdatapipeline_spark import registry

    out = tmp_path_factory.mktemp("containment")
    host_words = [f"hw{i}" for i in range(200)]
    excerpt = " ".join(host_words[50:101])          # 51 words, all inside host
    unrelated = " ".join(f"uw{i}" for i in range(60))
    rows = [
        (1, " ".join(host_words), "en", "web", 1000),
        (2, excerpt, "en", "web", 300),
        (3, unrelated, "en", "web", 300),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    got = registry.get("q_text_containment").fn(spark, str(out)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["excerpt_doc"] == 2 and r["host_doc"] == 1
    assert r["containment"] == 1.0 and r["n_excerpt"] == 49


def test_norm_dedup_merges_planted_variants(spark, tmp_path_factory):
    """q_dedup_exact_norm semantics: case/punctuation/whitespace variants
    of one text must share a norm_hash (merged_variants = true, lowest
    doc_id survives) while raw md5 dedup keeps them apart; a genuinely
    different doc stays its own group."""
    from asyncdatapipeline_spark import registry

    out = tmp_path_factory.mktemp("normdedup")
    rows = [
        (1, "The quick brown fox jumps over the dog", "en", "web", 100),
        (2, "the quick  brown fox jumps over the dog.", "en", "web", 100),
        (3, 'THE QUICK BROWN FOX, JUMPS OVER THE DOG!?', "en", "web", 100),
        (4, "an entirely different document body", "en", "web", 100),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    got = {
        r["norm_hash"]: r
        for r in registry.get("q_dedup_exact_norm").fn(spark, str(out)).collect()
    }
    assert len(got) == 2
    merged = [r for r in got.values() if r["n_docs"] == 3]
    assert len(merged) == 1
    m = merged[0]
    assert m["n_raw_variants"] == 3 and m["merged_variants"] and m["survivor_id"] == 1
    single = [r for r in got.values() if r["n_docs"] == 1][0]
    assert not single["merged_variants"] and single["survivor_id"] == 4


def test_pack_split_conserves_every_token(spark, sf_dir):
    """q_pack_split invariants: per doc, slices tile [0, n_tok) exactly
    (no token lost or duplicated at any boundary); per (source, pack),
    every pack is exactly CTX tokens except each source's tail pack;
    `continues` marks precisely the non-final slices of split docs."""
    from asyncdatapipeline_spark.llm.packing import _CTX_TOKENS

    out = registry.get("q_pack_split").fn(spark, sf_dir).cache()
    try:
        docs = (
            load_table(spark, sf_dir, "documents")
            .select(
                "doc_id",
                F.size(F.split("text", " ")).alias("n_tok"),
            )
            .filter(F.col("n_tok") > 0)
        )
        per_doc = out.groupBy("doc_id").agg(
            F.sum("slice_len").alias("tok_sum"),
            F.min("slice_start").alias("first_start"),
            F.max(F.col("slice_start") + F.col("slice_len")).alias("last_end"),
            F.sum(F.when(~F.col("continues"), 1).otherwise(0)).alias("n_final"),
        )
        j = docs.join(per_doc, "doc_id")
        bad = j.filter(
            (F.col("tok_sum") != F.col("n_tok"))
            | (F.col("first_start") != 0)
            | (F.col("last_end") != F.col("n_tok"))
            | (F.col("n_final") != 1)
        )
        assert bad.count() == 0, bad.limit(5).collect()

        per_pack = out.groupBy("source", "pack_id").agg(
            F.sum("slice_len").alias("fill")
        )
        wmax = per_pack.groupBy("source").agg(F.max("pack_id").alias("last"))
        nonfinal_bad = (
            per_pack.join(wmax, "source")
            .filter(F.col("pack_id") != F.col("last"))
            .filter(F.col("fill") != _CTX_TOKENS)
        )
        assert nonfinal_bad.count() == 0, nonfinal_bad.limit(5).collect()
    finally:
        out.unpersist()
