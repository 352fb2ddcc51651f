"""Event-time windows in batch mode (SURVEY.md §2B B44-B46 oracle side).

The same ``window()`` / ``session_window()`` expressions run identically
in batch and streaming (Structured Streaming's core design point); these
batch-mode registrations give the DuckDB-oracle-checkable half of
B44-B46, and tests/test_streaming.py asserts the streaming run of the
*same expression* produces the same rows (batch/stream equivalence,
SURVEY.md §5).

ns-precision note: ``events.ts`` is ns in parquet; Spark floors to µs on
read while DuckDB keeps ns. Tumbling/sliding bucket assignment is
unaffected (flooring never crosses a bucket boundary downward past the
bucket start), but *session* boundaries compare timestamps to each
other, so sessions run on second-truncated time on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from asyncdatapipeline_spark.operators._util import dsum, sql_dsum
from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table


@query(
    "q_window_tumbling",
    oracle=f"""
SELECT
  CAST(time_bucket(INTERVAL '6 hours', ts) AS TIMESTAMP) AS window_start,
  event_type,
  COUNT(*) AS n,
  {sql_dsum('value', 'sum_value')}
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6h event-time window aggregation (B44, batch mode).

    In streaming this exact expression runs with
    ``withWatermark("ts", ...)`` bounding state (tested in
    tests/test_streaming.py); window buckets are epoch-aligned in both
    engines.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "q_window_sliding",
    oracle=f"""
SELECT
  CAST(time_bucket(INTERVAL '6 hours', ts) AS TIMESTAMP)
    - k.k * INTERVAL '6 hours' AS window_start,
  COUNT(*) AS n,
  {sql_dsum('value', 'sum_value')}
FROM events, (VALUES (0), (1)) AS k(k)
GROUP BY 1
ORDER BY 1
""",
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 12h window, 6h slide (B45, batch mode): every event lands
    in exactly 2 overlapping windows (Spark expands via Expand, the
    oracle via a 2-row offset cross join)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "12 hours", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
        .orderBy("window_start")
    )


@query(
    "q_window_session",
    oracle=f"""
WITH t AS (
  SELECT user_id, date_trunc('second', ts) AS ts2, value,
    CASE WHEN date_trunc('second', ts)
              - lag(date_trunc('second', ts))
                OVER (PARTITION BY user_id ORDER BY date_trunc('second', ts))
              > INTERVAL '30 minutes'
         OR lag(ts) OVER (PARTITION BY user_id
                          ORDER BY date_trunc('second', ts)) IS NULL
    THEN 1 ELSE 0 END AS is_new
  FROM events
),
s AS (
  SELECT user_id, ts2, value,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts2
                      ROWS UNBOUNDED PRECEDING) AS session_no
  FROM t
)
SELECT user_id,
  CAST(min(ts2) AS TIMESTAMP) AS session_start,
  CAST(max(ts2) + INTERVAL '30 minutes' AS TIMESTAMP) AS session_end,
  COUNT(*) AS n_events,
  {sql_dsum('value', 'sum_value')}
FROM s
GROUP BY user_id, session_no
ORDER BY user_id, session_start
""",
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window, 30-minute gap (B46, batch mode).

    ``session_window`` sessionizes per user; the oracle reproduces it
    with the classic gaps-and-islands SQL (lag → new-session flag →
    running sum → group). Session end = last event + gap, matching
    Spark's session_window.end.
    """
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts2", F.date_trunc("second", "ts")
    )
    return (
        e.groupBy(F.session_window("ts2", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q_window_session_dynamic",
    # Gaps-and-islands generalized to PER-EVENT gaps: an event joins
    # the current session iff its ts <= the RUNNING MAX of preceding
    # (ts + gap) — the interval-merge semantics of Spark's dynamic
    # session_window (boundary inclusive, like the fixed-gap twin).
    # event_id tiebreaks same-second orderings; connectivity (and thus
    # the merged sessions) is tie-order-independent, the tiebreak just
    # pins both engines to one evaluation order.
    oracle=f"""
WITH t AS (
  SELECT user_id, event_id, date_trunc('second', ts) AS ts2, value,
    CASE WHEN event_type = 'purchase' THEN INTERVAL '45 minutes'
         ELSE INTERVAL '15 minutes' END AS gap
  FROM events
),
t2 AS (
  SELECT *, ts2 + gap AS ev_end,
    max(ts2 + gap) OVER (PARTITION BY user_id ORDER BY ts2, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS prev_end
  FROM t
),
s AS (
  SELECT *, SUM(CASE WHEN prev_end IS NULL OR ts2 > prev_end
                     THEN 1 ELSE 0 END)
    OVER (PARTITION BY user_id ORDER BY ts2, event_id
          ROWS UNBOUNDED PRECEDING) AS session_no
  FROM t2
)
SELECT user_id,
  CAST(min(ts2) AS TIMESTAMP) AS session_start,
  CAST(max(ev_end) AS TIMESTAMP) AS session_end,
  COUNT(*) AS n_events,
  {sql_dsum('value', 'sum_value')}
FROM s
GROUP BY user_id, session_no
ORDER BY user_id, session_start
""",
)
def q_window_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window with a DYNAMIC per-event gap (B46 extension):
    purchases hold a session open 45 minutes, everything else 15 — the
    per-event-type engagement timeout real session analytics use
    (checkout flows idle longer than browse flows).

    ``session_window(ts, gap_expr)`` merges each event's [ts, ts+gap)
    interval; the merged end is the MAX of member ends, not last-event
    + constant. The oracle generalizes gaps-and-islands to a running
    max of preceding interval ends. Same scale shape as the fixed-gap
    twin: one shuffle on user_id, per-user state bounded by the
    session count; in streaming mode the same expression drives
    watermark-evicted session state.
    """
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts2", F.date_trunc("second", "ts")
    )
    gap = F.when(F.col("event_type") == "purchase", "45 minutes").otherwise(
        "15 minutes"
    )
    return (
        e.groupBy(F.session_window("ts2", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q_window_sliding_distinct",
    # Exact distincts per overlapping window: the same 2-window Expand,
    # then COUNT(DISTINCT user_id) per bucket — integers, no armor.
    oracle="""
SELECT
  CAST(time_bucket(INTERVAL '6 hours', ts) AS TIMESTAMP)
    - k.k * INTERVAL '6 hours' AS window_start,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events, (VALUES (0), (1)) AS k(k)
GROUP BY 1
ORDER BY 1
""",
)
def q_window_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window DISTINCT users (12h window, 6h slide) — the
    rolling-active-users metric (DAU/WAU shape). Distinct-in-window is
    the aggregation sliding dashboards actually want and the one a
    plain sum can't pre-aggregate: distincts don't add across the
    overlap, so each window must deduplicate its own membership.

    Batch shape: the window() Expand doubles rows (each event lands in
    exactly 2 overlapping windows), then one exact distinct per bucket
    — the distinct expansion shuffles (window, user) pairs, bounded by
    windows × active-users. At 100 TB the mergeable swap is per-window
    HLL partials (q_agg_hll's union path: sketch per tumbling
    half-window, union pairs of adjacent sketches — distincts don't
    add, but sketches UNION); the exact form here is the oracle
    harness for that swap. In streaming the same expression runs
    watermarked with state bounded by open windows.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "12 hours", "6 hours").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "n_users", "n_events")
        .orderBy("window_start")
    )
