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

from pyspark.sql import Column, functions as F

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
