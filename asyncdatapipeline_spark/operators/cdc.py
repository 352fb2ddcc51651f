"""Change-data-capture / slowly-changing-dimension operators (north
star: ingest maintenance).

The reference's runtime is "collect a batch, process it"
(async_data_pipeline.go:67-71); the batch a warehouse ingest loop
processes is a CDC delta, and the canonical process step is the SCD
type-2 merge: close the current version of each changed key, open a new
one, keep history queryable by validity interval. Table formats
(Delta/Iceberg) package this as MERGE INTO; the relational core is
engine-level and lives here, expressed so the whole merge is ONE pass
over the dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table

# The fixture models the update batch deterministically: every 10th
# customer's balance moves by +100 at one effective instant, so the
# DuckDB oracle replays the merge exactly.
_SCD2_EPOCH = "1992-01-01 00:00:00"
_SCD2_EFF = "1998-06-01 00:00:00"


@query(
    "q_merge_scd2",
    oracle=f"""
WITH upd AS (
  SELECT c_custkey, c_acctbal + 100 AS new_bal FROM customer
  WHERE c_custkey % 10 = 0
)
SELECT c.c_custkey, c.c_acctbal,
       TIMESTAMP '{_SCD2_EPOCH}' AS valid_from,
       CASE WHEN u.c_custkey IS NULL THEN NULL
            ELSE TIMESTAMP '{_SCD2_EFF}' END AS valid_to,
       u.c_custkey IS NULL AS is_current
FROM customer c LEFT JOIN upd u USING (c_custkey)
UNION ALL
SELECT c_custkey, new_bal, TIMESTAMP '{_SCD2_EFF}', NULL, true FROM upd
ORDER BY c_custkey, valid_from
""",
)
def q_merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 merge (north star: CDC ingest): apply an update batch
    to a dimension, closing the changed keys' current rows at the
    effective instant and opening new current rows — history stays
    queryable by [valid_from, valid_to).

    One pass over the dimension: the (small) update batch broadcasts
    onto the dimension scan, and each row explodes 1→1-or-2 output rows
    via ``inline`` — matched keys emit [closed old, open new], untouched
    keys emit [open old]. No self-join, no second dimension scan, no
    shuffle of the dimension at all (the MERGE INTO shape minus the
    file-rewrite layer a table format adds). At 100 TB the dimension is
    the big side and this plan touches it exactly once, map-only.
    """
    c = load_table(spark, sf_dir, "customer")
    upd = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", (F.col("c_acctbal") + 100).alias("new_bal")
    )
    epoch = F.lit(_SCD2_EPOCH).cast("timestamp")
    eff = F.lit(_SCD2_EFF).cast("timestamp")
    null_ts = F.lit(None).cast("timestamp")

    def version(bal, valid_from, valid_to, is_current):
        return F.struct(
            bal.alias("c_acctbal"),
            valid_from.alias("valid_from"),
            valid_to.alias("valid_to"),
            is_current.alias("is_current"),
        )

    versions = F.when(
        F.col("new_bal").isNotNull(),
        F.array(
            version(F.col("c_acctbal"), epoch, eff, F.lit(False)),
            version(F.col("new_bal"), eff, null_ts, F.lit(True)),
        ),
    ).otherwise(
        F.array(version(F.col("c_acctbal"), epoch, null_ts, F.lit(True)))
    )
    return (
        c.join(F.broadcast(upd), "c_custkey", "left")
        .select("c_custkey", F.inline(versions))
        .orderBy("c_custkey", "valid_from")
    )




def cdc_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic change feed q_cdc_apply applies (snapshot as
    seq-0 upserts + derived updates/deletes/inserts) — shared with the
    streaming twin in streaming/curation.py and its equivalence test."""
    o = load_table(spark, sf_dir, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    ten = F.lit("10.00").cast("decimal(18,2)")

    def ev(k, op, price, status, seq):
        return o.select(
            k.alias("k"),
            F.lit(op).alias("op"),
            price.cast("decimal(18,2)").alias("price"),
            status.alias("status"),
            F.lit(seq).cast("int").alias("seq"),
        )

    base = ev(F.col("o_orderkey"), "U", price_dec, F.col("o_orderstatus"), 0)
    upd = o.filter(F.col("o_orderkey") % 13 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("U").alias("op"),
        (price_dec + ten).cast("decimal(18,2)").alias("price"),
        F.col("o_orderstatus").alias("status"),
        F.lit(1).cast("int").alias("seq"),
    )
    dels = o.filter(F.col("o_orderkey") % 17 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("decimal(18,2)").alias("price"),
        F.lit(None).cast("string").alias("status"),
        F.lit(2).cast("int").alias("seq"),
    )
    ins = o.filter(F.col("o_orderkey") % 19 == 0).select(
        (F.col("o_orderkey") + 1000000000).alias("k"),
        F.lit("I").alias("op"),
        price_dec.alias("price"),
        F.lit("O").alias("status"),
        F.lit(1).cast("int").alias("seq"),
    )
    return base.unionAll(upd).unionAll(dels).unionAll(ins)


def cdc_merge(feed: DataFrame) -> DataFrame:
    """Latest-wins reduction of a feed (or feed ∪ prior state): ONE
    max_by hash aggregate — associative and commutative, so merging
    micro-batch by micro-batch in ANY arrival order yields the same
    state as one big batch (the property the streaming equivalence
    test asserts). Tombstones survive the merge; filter at read."""
    return feed.groupBy("k").agg(
        F.max_by(F.struct("op", "price", "status", "seq"), "seq").alias("v")
    )


@query(
    "q_cdc_apply",
    # The change feed is DERIVED from orders by deterministic rules both
    # engines replay: seq 1 updates (%13 keys, +10.00), seq 2 deletes
    # (%17 keys — note %221 keys get update THEN delete, so delete must
    # win), seq 1 inserts (%19 keys re-keyed +1e9). Latest-wins per key.
    oracle="""
WITH feed AS (
  SELECT o_orderkey AS k, 'U' AS op,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         o_orderstatus AS status, 0 AS seq
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'U',
         CAST(o_totalprice AS DECIMAL(18,2)) + CAST(10.00 AS DECIMAL(18,2)),
         o_orderstatus, 1
  FROM orders WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT o_orderkey, 'D', NULL, NULL, 2
  FROM orders WHERE o_orderkey % 17 = 0
  UNION ALL
  SELECT o_orderkey + 1000000000, 'I',
         CAST(o_totalprice AS DECIMAL(18,2)), 'O', 1
  FROM orders WHERE o_orderkey % 19 = 0
),
latest AS (
  SELECT k, op, price, status,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn,
         seq
  FROM feed
)
SELECT k AS o_orderkey,
       round(CAST(price AS DOUBLE), 2) AS price,
       status,
       CAST(seq AS BIGINT) AS applied_seq
FROM latest WHERE rn = 1 AND op != 'D'
ORDER BY o_orderkey
""",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change feed (insert/update/delete events with sequence
    numbers) to a table snapshot, latest-change-wins per key — the other
    half of CDC ingest beside q_merge_scd2: scd2 keeps history, this
    materializes the CURRENT state from snapshot + feed (the replication
    "apply" step every warehouse mirror runs; Debezium/binlog semantics).
    The feed is derived deterministically from orders (updates on %13
    keys, deletes on %17 — %221 keys exercise update-then-delete ordering
    — inserts on %19 re-keyed) so the DuckDB oracle replays it exactly.

    Scale shape: snapshot rows enter the same union as feed events
    (seq 0), and latest-wins is ``max_by(struct(payload), seq)`` — ONE
    hash aggregate on the key, partial-aggregated map-side, no window
    sort over the union (the row_number formulation the oracle uses
    would sort every key group; max_by keeps per-key state to one
    struct). At 100 TB the snapshot is the big side and crosses the
    shuffle once, column-pruned to the payload; the feed is appended,
    not joined, so skewed feed keys cannot stall a join. Deletes
    survive the aggregate as tombstones and drop in the final filter.
    """
    feed = cdc_feed(spark, sf_dir)
    latest = cdc_merge(feed)
    return (
        latest.filter(F.col("v.op") != "D")
        .select(
            F.col("k").alias("o_orderkey"),
            # arithmetic stays in exact DECIMAL; only the REPORT column
            # drops to double (both engines round the same exact value)
            F.round(F.col("v.price").cast("double"), 2).alias("price"),
            F.col("v.status").alias("status"),
            F.col("v.seq").cast("long").alias("applied_seq"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_snapshot_diff",
    # Snapshot B is DERIVED from orders by deterministic rules both
    # engines replay: %11==0 rows deleted, %7==0 (and not %11) get
    # +1.00 on o_totalprice, plus two synthetic inserts. The diff
    # itself compares md5 row fingerprints — 32-byte digests, never
    # full rows, across the key join.
    oracle="""
WITH a AS (
  SELECT o_orderkey AS k,
         md5(o_orderstatus || '|' || CAST(CAST(o_totalprice
             AS DECIMAL(18,2)) AS VARCHAR) || '|' || o_orderpriority)
           AS fp
  FROM orders
),
b_src AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0
              THEN CAST(o_totalprice AS DECIMAL(18,2))
                   + CAST(1.00 AS DECIMAL(18,2))
              ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price,
         o_orderpriority
  FROM orders WHERE o_orderkey % 11 != 0
),
b AS (
  SELECT o_orderkey AS k,
         md5(o_orderstatus || '|' || CAST(price AS VARCHAR) || '|'
             || o_orderpriority) AS fp
  FROM b_src
  UNION ALL
  SELECT 900000001, md5('O|1.00|1-URGENT')
  UNION ALL
  SELECT 900000002, md5('O|2.00|2-HIGH')
),
d AS (
  SELECT COALESCE(a.k, b.k) AS k,
         CASE WHEN a.k IS NULL THEN 'added'
              WHEN b.k IS NULL THEN 'removed'
              WHEN a.fp != b.fp THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM a FULL OUTER JOIN b ON a.k = b.k
)
SELECT change_type,
       CAST(count(*) AS BIGINT) AS n,
       min(k) AS sample_key
FROM d GROUP BY change_type ORDER BY change_type
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC validation: classify every key across two
    table snapshots as added / removed / changed / unchanged by
    comparing per-row FINGERPRINTS — the migration-cutover and
    replication-audit query ("did the copy drift?"), and the
    change-data derivation when no CDC feed exists. Snapshot B is
    derived deterministically from orders (deletes, price bumps, two
    inserts) so the oracle replays the exact same diff.

    Scale shape: each side reduces to (key, md5 fingerprint) in its
    own scan — 32-byte digests cross the shuffle, never row payloads
    (the q_dedup_incremental_exact discipline applied to diffing);
    one FULL OUTER key join; the report is O(change types). The
    fingerprint canonicalizes floats through DECIMAL(18,2) before
    hashing — fingerprinting raw double formatting is the classic
    false-diff generator.
    """
    o = load_table(spark, sf_dir, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    fp_of = lambda price: F.md5(  # noqa: E731
        F.concat_ws(
            "|",
            F.col("o_orderstatus"),
            price.cast("string"),
            F.col("o_orderpriority"),
        ).cast("binary")
    )
    a = o.select(F.col("o_orderkey").alias("k"), fp_of(price_dec).alias("fp"))
    bumped = F.when(
        F.col("o_orderkey") % 7 == 0,
        price_dec + F.lit("1.00").cast("decimal(18,2)"),
    ).otherwise(price_dec)
    # two synthetic inserts (spark.range keeps it plan-side, no driver rows)
    spark_b_extra = (
        o.sparkSession.range(1)
        .select(
            F.lit(900000001).cast("long").alias("k"),
            F.md5(F.lit("O|1.00|1-URGENT").cast("binary")).alias("fp"),
        )
        .unionAll(
            o.sparkSession.range(1).select(
                F.lit(900000002).cast("long").alias("k"),
                F.md5(F.lit("O|2.00|2-HIGH").cast("binary")).alias("fp"),
            )
        )
    )
    b = (
        o.filter(F.col("o_orderkey") % 11 != 0)
        .select(F.col("o_orderkey").alias("k"), fp_of(bumped).alias("fp"))
        .unionAll(spark_b_extra)
    )
    d = a.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full")
    change = (
        F.when(F.col("a.k").isNull(), "added")
        .when(F.col("b.k").isNull(), "removed")
        .when(F.col("a.fp") != F.col("b.fp"), "changed")
        .otherwise("unchanged")
    )
    return (
        d.select(
            F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
            change.alias("change_type"),
        )
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"), F.min("k").alias("sample_key"))
        .orderBy("change_type")
    )


@query(
    "q_merge_upsert",
    # Source batch derived from customer: %7 keys get +50.00 (except
    # %14 keys, whose source row carries the SAME balance — the
    # conditional-update no-op case) and %50 keys spawn inserts
    # re-keyed +1e6. MERGE actions: updated / unchanged / untouched /
    # inserted.
    oracle="""
WITH src AS (
  SELECT c_custkey AS k,
         CASE WHEN c_custkey % 14 = 0
              THEN CAST(c_acctbal AS DECIMAL(18,2))
              ELSE CAST(c_acctbal AS DECIMAL(18,2))
                   + CAST(50.00 AS DECIMAL(18,2)) END AS new_bal
  FROM customer WHERE c_custkey % 7 = 0
),
ins AS (
  SELECT c_custkey + 1000000 AS k,
         CAST(c_acctbal AS DECIMAL(18,2)) AS new_bal
  FROM customer WHERE c_custkey % 50 = 0
),
merged AS (
  SELECT c.c_custkey AS k,
         CASE WHEN s.k IS NULL THEN CAST(c.c_acctbal AS DECIMAL(18,2))
              ELSE s.new_bal END AS bal,
         CASE WHEN s.k IS NULL THEN 'untouched'
              WHEN s.new_bal = CAST(c.c_acctbal AS DECIMAL(18,2))
                THEN 'unchanged'
              ELSE 'updated' END AS action
  FROM customer c LEFT JOIN src s ON s.k = c.c_custkey
  UNION ALL
  SELECT k, new_bal, 'inserted' FROM ins
)
SELECT k AS c_custkey,
       round(CAST(bal AS DOUBLE), 2) AS c_acctbal,
       action
FROM merged ORDER BY c_custkey
""",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) semantics with per-row action accounting:
    WHEN MATCHED AND changed THEN UPDATE, WHEN MATCHED AND identical
    THEN no-op, WHEN NOT MATCHED THEN INSERT — the third CDC primitive
    beside q_merge_scd2 (history) and q_cdc_apply (feed replay): a
    batch upsert against a dimension, with the action tags a MERGE
    statement reports (and audit pipelines reconcile against).

    One pass over the dimension: the source batch is dimension-derived
    and SMALL, so it broadcasts onto the target scan — matched rows
    resolve update-vs-no-op with a row-local comparison in exact
    DECIMAL (comparing doubles for "did it change" is the classic
    false-update generator); inserts append by union, never join. The
    dimension is touched exactly once, map-only — the MERGE INTO shape
    minus the table-format file rewrite, same doctrine as q_merge_scd2.
    """
    c = load_table(spark, sf_dir, "customer")
    bal_dec = F.col("c_acctbal").cast("decimal(18,2)")
    fifty = F.lit("50.00").cast("decimal(18,2)")
    src = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("k"),
        F.when(F.col("c_custkey") % 14 == 0, bal_dec)
        .otherwise((bal_dec + fifty).cast("decimal(18,2)"))
        .alias("new_bal"),
    )
    ins = c.filter(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.round(bal_dec.cast("double"), 2).alias("c_acctbal"),
        F.lit("inserted").alias("action"),
    )
    merged = (
        c.join(F.broadcast(src), c.c_custkey == src.k, "left")
        .select(
            "c_custkey",
            F.round(
                F.when(F.col("k").isNull(), bal_dec)
                .otherwise(F.col("new_bal"))
                .cast("double"),
                2,
            ).alias("c_acctbal"),
            F.when(F.col("k").isNull(), "untouched")
            .when(F.col("new_bal") == bal_dec, "unchanged")
            .otherwise("updated")
            .alias("action"),
        )
        .unionAll(ins)
    )
    return merged.orderBy("c_custkey")


@query(
    "q_join_pit",
    # Dimension = q_merge_scd2's versioned output (same derivation
    # inlined); each order resolves the version valid AT ORDER TIME:
    # equality on custkey + [valid_from, valid_to) containment.
    oracle=f"""
WITH upd AS (
  SELECT c_custkey, c_acctbal + 100 AS new_bal FROM customer
  WHERE c_custkey % 10 = 0
),
dim AS (
  SELECT c.c_custkey, c.c_acctbal AS bal,
         TIMESTAMP '{_SCD2_EPOCH}' AS valid_from,
         CASE WHEN u.c_custkey IS NULL THEN NULL
              ELSE TIMESTAMP '{_SCD2_EFF}' END AS valid_to
  FROM customer c LEFT JOIN upd u USING (c_custkey)
  UNION ALL
  SELECT c_custkey, new_bal, TIMESTAMP '{_SCD2_EFF}', NULL FROM upd
),
j AS (
  SELECT o.o_orderkey, o.o_custkey,
         round(CAST(d.bal AS DOUBLE), 2) AS bal_at_order,
         d.valid_to IS NULL AS used_current_version
  FROM orders o
  JOIN dim d ON d.c_custkey = o.o_custkey
            AND o.o_orderdate >= d.valid_from
            AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
)
SELECT o_orderkey, o_custkey, bal_at_order, used_current_version
FROM j ORDER BY o_orderkey
""",
)
def q_join_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each order resolves the customer-dimension
    VERSION that was valid at order time — the lookup that makes SCD2
    history useful (q_merge_scd2 builds the versioned dimension; a
    naive join to the current version backfills today's attributes
    onto yesterday's facts, the classic feature-leakage bug in both
    BI and ML training sets; feature stores call exactly this "PIT
    correctness").

    Scale shape: equality on the customer key carries the join — the
    interval containment is a residual predicate evaluated on ≤2
    candidate versions per key (SCD dimensions have few versions per
    key by construction), so this stays a plain hash/broadcast equi
    join, NOT an interval-binned join (q_join_interval's machinery is
    for when there is no equality key). Each order matches EXACTLY one
    version (validity intervals partition the timeline); the planted
    test asserts both resolution sides of the effective instant.
    """
    o = load_table(spark, sf_dir, "orders")
    dim = q_merge_scd2(spark, sf_dir).select(
        "c_custkey",
        F.col("c_acctbal").alias("bal"),
        "valid_from",
        "valid_to",
    )
    return (
        o.join(
            F.broadcast(dim),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderdate") >= F.col("valid_from"))
            & (
                F.col("valid_to").isNull()
                | (F.col("o_orderdate") < F.col("valid_to"))
            ),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("bal").cast("double"), 2).alias("bal_at_order"),
            F.col("valid_to").isNull().alias("used_current_version"),
        )
        .orderBy("o_orderkey")
    )


# Survivorship fixture: source B is a CRM-style partial refresh DATED
# AFTER source A (the warehouse master): %4 keys got a new address
# (non-null wins), %6 keys arrived with a NULL phone (must NOT
# overwrite A's derived value), %5 keys got a fresher balance. (The
# fixture customer table has no address/phone columns; segment + a
# key-derived phone stand in for the survivable fields.)
_MDM_B_DATE = "1998-01-01"
_MDM_A_DATE = "1995-01-01"


@query(
    "q_mdm_survivorship",
    oracle=f"""
WITH a AS (
  SELECT c_custkey, c_name, c_mktsegment,
         'P-' || CAST(c_custkey AS VARCHAR) AS phone,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer
),
b AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 4 = 0
              THEN 'REFRESH:' || c_mktsegment END AS b_seg,
         CASE WHEN c_custkey % 6 = 0 THEN NULL
              ELSE 'P-' || CAST(c_custkey AS VARCHAR) END AS b_phone,
         CASE WHEN c_custkey % 5 = 0
              THEN CAST(c_acctbal AS DECIMAL(18,2))
                   + CAST(7.00 AS DECIMAL(18,2)) END AS b_bal
  FROM customer WHERE c_custkey % 2 = 0
)
SELECT a.c_custkey,
       a.c_name,
       COALESCE(b.b_seg, a.c_mktsegment) AS segment,
       CASE WHEN b.b_seg IS NOT NULL THEN 'crm' ELSE 'master' END
         AS segment_source,
       COALESCE(b.b_phone, a.phone) AS phone,
       round(CAST(COALESCE(b.b_bal, a.bal) AS DOUBLE), 2) AS balance,
       CASE WHEN b.b_bal IS NOT NULL THEN 'crm' ELSE 'master' END
         AS balance_source
FROM a LEFT JOIN b ON b.c_custkey = a.c_custkey
ORDER BY a.c_custkey
""",
)
def q_mdm_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship: merge the warehouse master with a
    NEWER partial CRM refresh under field-level precedence — most
    recent NON-NULL wins per field, with per-field PROVENANCE columns
    (which source won) — the master-data-management merge that record
    linkage feeds into (q_join_fuzzy finds the matches; this decides
    what the merged record SAYS, and a record-level "newest wins"
    would wrongly null out fields the refresh didn't carry — exactly
    what the %6 null-phone keys plant).

    Scale shape: the refresh is a fraction of the master and
    broadcasts onto ONE master scan; survivorship is row-local
    COALESCE cascades ordered by source recency (N sources = a
    coalesce of N, or max_by(value, as_of) FILTER non-null per field
    — the q_cdc_apply device at field grain); provenance is the same
    CASE, free. Balance precedence compares in exact DECIMAL.
    """
    c = load_table(spark, sf_dir, "customer")
    phone = F.concat(F.lit("P-"), F.col("c_custkey").cast("string"))
    a = c.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        phone.alias("phone"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    seven = F.lit("7.00").cast("decimal(18,2)")
    b = (
        c.filter(F.col("c_custkey") % 2 == 0)
        .select(
            F.col("c_custkey").alias("bk"),
            F.when(
                F.col("c_custkey") % 4 == 0,
                F.concat(F.lit("REFRESH:"), F.col("c_mktsegment")),
            ).alias("b_seg"),
            F.when(F.col("c_custkey") % 6 == 0, F.lit(None)).otherwise(
                phone
            ).alias("b_phone"),
            F.when(
                F.col("c_custkey") % 5 == 0,
                (F.col("c_acctbal").cast("decimal(18,2)") + seven).cast(
                    "decimal(18,2)"
                ),
            ).alias("b_bal"),
        )
    )
    return (
        a.join(F.broadcast(b), a.c_custkey == b.bk, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("b_seg", "c_mktsegment").alias("segment"),
            F.when(F.col("b_seg").isNotNull(), "crm")
            .otherwise("master")
            .alias("segment_source"),
            F.coalesce("b_phone", "phone").alias("phone"),
            F.round(
                F.coalesce("b_bal", "bal").cast("double"), 2
            ).alias("balance"),
            F.when(F.col("b_bal").isNotNull(), "crm")
            .otherwise("master")
            .alias("balance_source"),
        )
        .orderBy("c_custkey")
    )
