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
