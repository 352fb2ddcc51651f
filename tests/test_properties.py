"""Property-based tests (hypothesis) for engine invariants.

The reference has no randomized testing at all (SURVEY.md §5); these
cover the invariants that must hold for ANY input, not just the fixture
corpus: salted-join equivalence, dedup-grouping partition laws, minhash
signature determinism/containment, and the decimal-armored sum's
order-independence (the engine-wide oracle-stability mechanism).

Spark-free where possible (pure helpers), tiny-DataFrame where not —
hypothesis shrinks fast when each example avoids a Spark job.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

# -- pure-python invariants ------------------------------------------------


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40)))
def test_exact_dedup_partition_law(texts):
    """Exact dedup groups partition the corpus: group sizes sum to the
    corpus size, every text in exactly one group (model of
    q_dedup_exact's groupBy-on-hash)."""
    groups = Counter(texts)
    assert sum(groups.values()) == len(texts)
    assert set(groups) == set(texts)


@settings(deadline=None)  # first example pays the module-import cost
@given(
    st.lists(st.integers(min_value=0, max_value=2**31 - 2), min_size=1, max_size=60),
    st.lists(st.integers(min_value=0, max_value=2**31 - 2), min_size=0, max_size=20),
)
def test_minhash_lane_containment(base, extra):
    """Adding shingles can only LOWER each minhash lane (min is monotone
    under set growth) — the property LSH banding correctness rests on."""
    from asyncdatapipeline_spark.llm.dedup import (
        _MINHASH_A,
        _MINHASH_B,
        _MINHASH_K,
        _MINHASH_P,
    )

    def sig(hashes):
        return [
            min((_MINHASH_A[i] * h + _MINHASH_B[i]) % _MINHASH_P for h in hashes)
            for i in range(_MINHASH_K)
        ]

    s1, s2 = sig(base), sig(base + extra) if base + extra else None
    if s2 is not None:
        assert all(b <= a for a, b in zip(s1, s2))


@given(st.integers(min_value=1, max_value=64))
def test_minhash_constants_valid(k):
    """The LCG-derived affine constants stay in the universal-hash
    family's valid range for any signature length."""
    from asyncdatapipeline_spark.llm.dedup import _MINHASH_P, _lcg_constants

    a, b = _lcg_constants(k)
    assert len(a) == len(b) == k
    assert all(1 <= x <= _MINHASH_P - 1 for x in a)
    assert all(0 <= x <= _MINHASH_P - 1 for x in b)
    # deterministic: same seed → same constants
    assert (a, b) == _lcg_constants(k)


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=0,
        max_size=50,
    ),
    st.randoms(use_true_random=False),
)
def test_decimal_sum_order_independent(values, rnd):
    """The decimal-armored sum (operators/_util.py doctrine) is exactly
    permutation-invariant — raw double summation is not, which is why
    every engine sum goes through the decimal cast."""
    from decimal import Decimal

    def dec_sum(vals):
        return sum(
            (Decimal(str(round(v, 6))) for v in vals), start=Decimal(0)
        )

    shuffled = list(values)
    rnd.shuffle(shuffled)
    assert dec_sum(values) == dec_sum(shuffled)


# -- spark-backed invariants ----------------------------------------------

small_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # key
        st.integers(min_value=0, max_value=999),  # payload
    ),
    min_size=0,
    max_size=25,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(big=small_rows, small=small_rows)
def test_salted_join_equivalence(spark, big, small):
    """salted_join ≡ plain inner join for arbitrary key multisets
    (including empty sides, absent keys, and duplicate keys on both
    sides — the multiplicity algebra must survive the salt fan-out)."""
    from asyncdatapipeline_spark.operators.layout import salted_join

    b = spark.createDataFrame(
        [(k, v) for k, v in big] or [(None, None)], "bk int, bv int"
    ).filter("bk is not null")
    s = spark.createDataFrame(
        [(k, v) for k, v in small] or [(None, None)], "sk int, sv int"
    ).filter("sk is not null")
    got = Counter(
        map(tuple, salted_join(b, s, "bk", "sk", n_salts=4).collect())
    )
    want = Counter(
        map(tuple, b.join(s, b.bk == s.sk, "inner").collect())
    )
    assert got == want


# -- raw array/map output coverage -----------------------------------------
# The registered queries emit array/map results stringified (the driver's
# canonicalizer hashes scalar cells only); these tests keep the underlying
# array-typed semantics covered on the fixture tables.


def test_collect_set_raw_arrays(spark, sf_dir):
    """sort_array(collect_set(...)) returns real sorted string arrays
    matching a distinct-set ground truth per group."""
    from pyspark.sql import functions as F

    from asyncdatapipeline_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "nation")
    got = {
        r["n_regionkey"]: r["nations"]
        for r in n.groupBy("n_regionkey")
        .agg(F.sort_array(F.collect_set("n_name")).alias("nations"))
        .collect()
    }
    want: dict[int, set[str]] = {}
    for r in n.select("n_regionkey", "n_name").collect():
        want.setdefault(r["n_regionkey"], set()).add(r["n_name"])
    assert set(got) == set(want)
    for k, names in want.items():
        assert got[k] == sorted(names)
        assert isinstance(got[k], list)


def test_fn_array_raw_arrays(spark, sf_dir):
    """slice/transform produce real float arrays: head4 is the first 4
    embedding components and head4_doubled is exactly 2x each."""
    from pyspark.sql import functions as F

    from asyncdatapipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").limit(20)
    emb = F.col("embedding")
    rows = e.select(
        "embedding",
        F.slice(emb, 1, 4).alias("head4"),
        F.transform(
            F.slice(emb, 1, 4), lambda x: x.cast("double") * 2
        ).alias("head4_doubled"),
    ).collect()
    assert rows
    for r in rows:
        assert r["head4"] == r["embedding"][:4]
        for raw, dbl in zip(r["head4"], r["head4_doubled"]):
            assert abs(float(raw) * 2 - dbl) < 1e-9


def test_fn_map_raw_map(spark, sf_dir):
    """create_map round-trips as a real MapType value: keys/values match
    the source columns."""
    from pyspark.sql import functions as F

    from asyncdatapipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").limit(20)
    m = F.create_map(
        F.lit("type"), F.col("event_type").cast("string"),
        F.lit("value"), F.col("value").cast("string"),
    )
    rows = e.select("event_type", "value", m.alias("m")).collect()
    assert rows
    for r in rows:
        assert isinstance(r["m"], dict)
        assert sorted(r["m"].keys()) == ["type", "value"]
        assert r["m"]["type"] == str(r["event_type"])


# -- curation-filter contracts (filtering.py) ------------------------------


@settings(
    deadline=None,
    max_examples=15,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    )
)
def test_rep_fracs_match_python_reference(spark, texts):
    """The Spark repetition expressions (longest-run top-word fold,
    zip_with 2-grams, let-bound dup fraction) equal a direct Python
    recomputation of the definitions on arbitrary texts."""
    from collections import Counter as C

    from pyspark.sql import functions as F

    from asyncdatapipeline_spark.llm.filtering import _rep_fracs

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    n, dup2, topw = _rep_fracs(F.col("text"))
    got = {
        r["i"]: (r["d"], r["t"])
        for r in df.select("i", dup2.alias("d"), topw.alias("t")).collect()
    }
    for i, t in enumerate(texts):
        w = t.split(" ")
        g2 = [f"{a} {b}" for a, b in zip(w, w[1:])]
        exp_d = round(1.0 - len(set(g2)) / len(g2), 6) if g2 else 0.0
        exp_t = round(max(C(w).values()) / len(w), 6) if w else 0.0
        assert got[i] == (exp_d, exp_t), (t, got[i], (exp_d, exp_t))


@settings(
    deadline=None,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="xy z", min_size=0, max_size=50),
        min_size=1,
        max_size=6,
    )
)
def test_shingle_array_matches_python_reference(spark, texts):
    """zip_with shingle construction == the 3-gram definition."""
    from pyspark.sql import functions as F

    from asyncdatapipeline_spark.llm.dedup import _shingle_array

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", _shingle_array(F.col("text")).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        w = t.split(" ")
        exp = list(dict.fromkeys(
            f"{w[j]} {w[j+1]} {w[j+2]}" for j in range(len(w) - 2)
        )) if len(w) >= 3 else []
        assert got[i] == exp, (t, got[i], exp)


def test_split_hash_matches_python_md5(spark, sf_dir):
    """q_split_hash's bucket equals hashlib.md5 of the decimal doc_id —
    the cross-engine contract DuckDB relies on."""
    import hashlib

    from asyncdatapipeline_spark import registry

    rows = registry.get("q_split_hash").fn(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        exp = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2], 16)
        assert r["bucket"] == exp


# -- round-4 primitives ----------------------------------------------------


def _morton_ref(a: int, b: int) -> int:
    """Bit-interleave reference: a in even lanes, b in odd."""
    out = 0
    for i in range(16):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


@settings(deadline=None)  # DuckDB round-trip per example: load-sensitive
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_zorder_key_matches_python_reference(pairs):
    """The generated mask-cascade SQL (DuckDB dialect — same generator
    as the Spark spelling, shifts aside) must equal naive per-bit
    interleaving for the full 16-bit × 16-bit domain."""
    import duckdb

    from asyncdatapipeline_spark.operators.layout import _zkey_duck

    con = duckdb.connect()
    con.sql("CREATE TABLE p (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    got = con.sql(f"SELECT {_zkey_duck('a', 'b')} FROM p").fetchall()
    for (a, b), (g,) in zip(pairs, got):
        assert g == _morton_ref(a, b), (a, b, g)


@given(st.binary(min_size=72, max_size=400), st.integers(0, 399), st.integers(0, 255))
def test_phash_stub_properties(payload, pos, newbyte):
    """Deterministic, signed-64-ranged, and local: one mutated byte
    moves at most 8 bits (each sampled position touches ≤ 2 dHash
    comparisons, and a byte is sampled ≤ 2× once len ≥ 72)."""
    from asyncdatapipeline_spark.llm.multimodal import phash_stub

    h1 = phash_stub(payload)
    assert -(1 << 63) <= h1 < (1 << 63)
    assert phash_stub(payload) == h1
    pos = pos % len(payload)
    mutated = payload[:pos] + bytes([newbyte]) + payload[pos + 1 :]
    h2 = phash_stub(mutated)
    hamming = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
    assert hamming <= 8, (pos, hamming)


def test_sessionize_boundary_exact_gap(spark):
    """The session rule is STRICTLY greater than the gap: events exactly
    1800s apart stay in one session; 1801s starts a new one."""
    import datetime as dt

    from asyncdatapipeline_spark import registry

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(seconds=1800), 7, "view", 1.0, "{}"),
        (3, t0 + dt.timedelta(seconds=3601), 7, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {
            r["event_id"]: r["session_seq"]
            for r in registry.get("q_sessionize").fn(spark, d).collect()
        }
    assert out == {1: 1, 2: 1, 3: 2}, out


@given(
    st.integers(min_value=-(10**14), max_value=10**14),
    st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=100, deadline=None)
def test_micro_unit_mean_cross_engine(s, n):
    """The IVF Lloyd mean contract (llm/similarity._ivf_centroids):
    Python's float(s)/n/1e6 must equal DuckDB's
    CAST(s AS DOUBLE)/n/1e6 bit-for-bit for any exact integer sum and
    count — the property that makes the refined centroids replayable."""
    import duckdb

    global _MICRO_CON
    try:
        con = _MICRO_CON
    except NameError:
        con = _MICRO_CON = duckdb.connect()
    py = float(s) / n / 1e6
    db = con.sql(f"SELECT CAST({s} AS DOUBLE)/{n}/1e6").fetchone()[0]
    assert py == db


# -- round-8 device invariants ----------------------------------------------

_dc_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # group
        st.integers(min_value=-5, max_value=5),    # order value (tie-heavy)
        st.integers(min_value=0, max_value=99),    # payload
    ),
    min_size=0,
    max_size=30,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_dc_rows, desc=st.booleans())
def test_dist_cumsum_generalized_equals_window(spark, rows, desc):
    """The generalized device (part_cols + tiebreak + descending) must
    equal the per-group ordered-window running sum for ARBITRARY
    multisets — tie-heavy values, empty input, single groups, both
    directions (the invariant the round-8 gate rests on)."""
    from pyspark.sql import Window as W, functions as F

    from asyncdatapipeline_spark.operators._util import dist_cumsum

    df = spark.createDataFrame(
        [(i, g, v, x) for i, (g, v, x) in enumerate(rows)]
        or [(None, None, None, None)],
        "id long, g long, v long, x long",
    ).filter("id is not null")
    got = dist_cumsum(
        df.withColumn("one", F.lit(1)),
        "v",
        ["one", "x"],
        nparts=4,
        part_cols=["g"],
        tiebreak=["id"],
        descending=desc,
    ).select("id", "cum_one", "cum_x")
    order = [F.col("v").desc() if desc else F.col("v"), "id"]
    w = (
        W.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    want = df.select(
        "id",
        F.count(F.lit(1)).over(w).alias("r_one"),
        F.sum("x").over(w).alias("r_x"),
    )
    bad = (
        got.join(want, "id")
        .filter(
            (F.col("cum_one") != F.col("r_one"))
            | (F.col("cum_x") != F.col("r_x"))
        )
        .count()
    )
    assert bad == 0


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(n=st.integers(min_value=1, max_value=200),
       k=st.sampled_from([2, 3, 5, 7]))
def test_spark_ntile_closed_form_equals_builtin(spark, n, k):
    """spark_ntile(row_number, n, k) ≡ F.ntile(k) for arbitrary n and
    bucket counts, including n < k and exact-multiple splits."""
    from pyspark.sql import Window as W, functions as F

    from asyncdatapipeline_spark.operators._util import spark_ntile

    df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "r long")
    bad = (
        df.select(
            "r",
            spark_ntile(F.col("r"), F.lit(n), k).alias("a"),
            F.ntile(k).over(W.orderBy("r")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert bad == 0


# -- round-10 pure invariants ------------------------------------------------


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=20),
        min_size=1,
        max_size=12,
    )
)
def test_heaps_curve_model_invariants(doc_words):
    """Pure-python model of q_text_heaps' cumulative algebra: for ANY
    corpus, cumulative vocab is nondecreasing, never exceeds cumulative
    tokens, and the final point equals (total tokens, |vocab|)."""
    seen: set[int] = set()
    ct = cv = 0
    pts = []
    for words in doc_words:
        ct += len(words)
        for w in words:
            if w not in seen:
                seen.add(w)
                cv += 1
        pts.append((ct, cv))
    assert all(v <= t for t, v in pts)
    assert all(pts[i][1] <= pts[i + 1][1] for i in range(len(pts) - 1))
    assert pts[-1] == (sum(len(w) for w in doc_words), len(seen))


@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=50)
)
def test_curriculum_banding_partitions_corpus(tokens):
    """q_mix_curriculum's band rule is a PARTITION: every doc lands in
    exactly one stage and stage populations sum back to the corpus."""
    bands = (25, 50, 75)

    def stage(n):
        for s, b in enumerate(bands, start=1):
            if n < b:
                return s
        return len(bands) + 1

    stages = [stage(n) for n in tokens]
    assert all(1 <= s <= 4 for s in stages)
    assert len(stages) == len(tokens)
    from collections import Counter

    assert sum(Counter(stages).values()) == len(tokens)


@given(
    st.lists(
        st.floats(min_value=-1, max_value=1, allow_nan=False), min_size=8, max_size=8
    ),
    st.lists(
        st.floats(min_value=-1, max_value=1, allow_nan=False), min_size=8, max_size=8
    ),
)
def test_dup_payment_band_probe_complete(a_f, b_f):
    """The ±1-band completeness argument of q_orders_dup_payments,
    checked as arithmetic: for any two amounts within the tolerance,
    their band ids differ by at most 1 when band width ≥ tolerance."""
    tol, width = 50_000, 100_000
    a = int(a_f[0] * 10_000_000) + 20_000_000
    b = max(0, min(a + int(b_f[0] * tol), a + tol))
    assert abs(a - b) <= tol
    assert abs(a // width - b // width) <= 1
