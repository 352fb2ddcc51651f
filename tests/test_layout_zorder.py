"""Z-order layout property: writing zkey-sorted files bounds per-file
min/max spans in BOTH dimensions — the statistic the row-group pruner
uses — while arrival-order files span everything (no pruning possible).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from asyncdatapipeline_spark.operators.layout import _zkey_spark
from asyncdatapipeline_spark.sources.tables import load_table


def _mean_span_fraction(spark, path, col):
    """Mean per-file (max-min)/(global range) for `col` — 1.0 means
    every file spans the whole domain (pruning never skips a file)."""
    df = spark.read.parquet(path).select(
        col, F.input_file_name().alias("f")
    )
    g = df.agg(F.min(col), F.max(col)).first()
    lo, hi = g[0], g[1]
    per_file = (
        df.groupBy("f")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .agg(F.avg("span"))
        .first()[0]
    )
    return per_file / (hi - lo) if hi > lo else 0.0


def test_zorder_sorted_files_bound_both_dims(spark, sf_dir, tmp_path):
    h = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("unix_timestamp(ts) div 3600").alias("hour_id"),
    )
    mins = h.agg(
        F.min("user_id").alias("u0"),
        F.max("user_id").alias("u1"),
        F.min("hour_id").alias("h0"),
        F.max("hour_id").alias("h1"),
    )
    ub = "(((user_id - u0) * 255) div greatest(1, u1 - u0))"
    hb = "(((hour_id - h0) * 255) div greatest(1, h1 - h0))"
    e = h.crossJoin(F.broadcast(mins)).select(
        "event_id",
        "user_id",
        "hour_id",
        F.expr(_zkey_spark(ub, hb)).alias("zkey"),
    )
    n_files = 16
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zorder")
    # Arrival order: round-robin spread (every file sees everything).
    e.repartition(n_files).write.mode("overwrite").parquet(naive)
    # Z-order: range-partition + in-file sort on the Morton key.
    e.repartitionByRange(n_files, "zkey").sortWithinPartitions(
        "zkey"
    ).write.mode("overwrite").parquet(zord)

    for col in ("user_id", "hour_id"):
        f_naive = _mean_span_fraction(spark, naive, col)
        f_z = _mean_span_fraction(spark, zord, col)
        # Naive files span ~the whole domain; Z-ordered files must be
        # materially tighter in BOTH dims simultaneously.
        assert f_naive > 0.9, f"{col}: naive layout unexpectedly tight"
        assert f_z < 0.65 * f_naive, (
            f"{col}: zorder span fraction {f_z:.3f} not materially "
            f"tighter than naive {f_naive:.3f}"
        )
