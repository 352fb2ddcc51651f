"""Shared helpers for oracle-stable, order-independent aggregation.

Floating-point sums are order-dependent; Spark and DuckDB will sum
partitions in different orders and disagree in the low bits, which breaks
the driver's value-hash comparison. The fix used engine-wide:

- **sums**: cast each addend to an exact DECIMAL before summing (exact,
  associative, order-independent), cast the final sum to DOUBLE. Both
  engines round the same binary double to the same decimal (no binary
  double ever sits exactly on a half-ulp decimal tie at scale 4) and the
  final decimal→double conversion is IEEE round-nearest in both.
- **averages**: exact decimal sum → double, divided by the exact count —
  a single deterministic IEEE division.

This also matters at scale: decimal partial aggregates are
order-independent, so results don't wobble between runs/plans (AQE may
change the merge order at 100 TB).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# Engine-wide exact accumulator type. Scale 6 ≥ the true decimal places of
# any fixture expression (2dp money × 2dp discount × 2dp tax = 6dp), so the
# double→decimal cast never lands on a rounding tie — Spark (HALF_UP) and
# DuckDB (half-even) agree on every row.
DEC = "decimal(28,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM(double) → DOUBLE via exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG(double) → DOUBLE (decimal sum / count)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def dist_cumsum(
    df: DataFrame,
    order_col: str,
    sum_cols: Sequence[str],
    nparts: int = 32,
) -> DataFrame:
    """EXACT cumulative sums over a total ordering, fully distributed —
    the scale-safe replacement for ``W.orderBy(col)`` running sums
    (which move the whole frame to ONE partition; BENCH's
    ``WindowExec: No Partition Defined`` warning is that plan talking).

    Device: equi-depth range bucketing with EXPLICIT boundaries —
    ``percentile_approx`` boundaries are collected ONCE to the driver
    (≤ ``nparts − 1`` scalars, the sanctioned O(1) collect class) and
    embedded as literals, so the bucket id is a pure deterministic
    expression of the VALUE. (First cut used
    ``repartitionByRange`` + ``spark_partition_id()``; that frame is
    evaluated twice — per-bucket totals vs. the main path — and
    RangePartitioner re-SAMPLES boundaries per evaluation, so the two
    evaluations can disagree and the offsets silently mismatch the
    running sums. Literal boundaries are exactly how a production
    range shuffle ships its map — computed once, immutable.) Then:

    1. per-bucket totals (``nparts`` rows) →
    2. exclusive prefix over the bucket totals via a TRIANGULAR
       broadcast self-join (``b._pid < a._pid``, ≤ nparts² pairs —
       bounded by ``nparts``, never by data size; deliberately a join,
       not an unpartitioned window, so no plan ever moves data-sized
       frames to one partition and the bench tail stays free of
       ``WindowExec`` warnings) →
    3. broadcast the offsets back and add them to per-bucket running
       sums (``partitionBy(_pid)`` windows: each frame is ~1/nparts
       of the data, sorted locally). The bucket expression casts to
       DOUBLE only for the boundary comparison — a monotone map, so
       bucket order respects the exact ``order_col`` order even where
       the cast collapses near-equal values; balance is approximate,
       order is exact.

    Ties: callers pass a frame already grouped to DISTINCT
    ``order_col`` values (numeric — boundaries come from
    ``percentile_approx``), so the within-bucket ordering is total and
    the cumulative value at each row is the tie-group-end value —
    identical to a ``RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT
    ROW`` frame on the raw rows. NULL values of ``order_col`` compare
    UNKNOWN against every boundary and land in bucket 0 — the
    nulls-first convention of the window form it replaces.

    Output: input columns plus ``cum_<c>`` for each ``c`` in
    ``sum_cols``. Cost: one tiny boundary aggregate + one hash
    shuffle on ``_pid``, both ~|distinct values| rows; no data-sized
    single partition anywhere.
    """
    qs = [i / nparts for i in range(1, nparts)]
    row = df.agg(
        F.percentile_approx(
            F.col(order_col).cast("double"), F.array(*[F.lit(q) for q in qs]),
            F.lit(10_000),
        ).alias("b")
    ).collect()[0]
    bounds = sorted({b for b in (row["b"] or []) if b is not None})
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(
            F.col(order_col).cast("double") > F.lit(b), 1
        ).otherwise(0)
    d = df.withColumn("_pid", bucket)
    per = d.groupBy("_pid").agg(
        *[F.sum(c).alias(f"_t_{c}") for c in sum_cols]
    )
    offs = (
        per.alias("a")
        .join(
            F.broadcast(per.alias("b")),
            F.col("b._pid") < F.col("a._pid"),
            "left",
        )
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(
            *[
                F.coalesce(F.sum(f"b._t_{c}"), F.lit(0)).alias(f"_o_{c}")
                for c in sum_cols
            ]
        )
    )
    d = d.join(F.broadcast(offs), "_pid")
    wv = (
        W.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    out = d.select(
        *df.columns,
        *[
            (F.sum(c).over(wv) + F.col(f"_o_{c}")).alias(f"cum_{c}")
            for c in sum_cols
        ],
    )
    return out
