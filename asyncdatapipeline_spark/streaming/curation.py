"""Streaming curation gate (SURVEY.md Layer A × Layer B composition).

The reference's entire runtime is "collect batches, process them"
(async_data_pipeline.go:67-71 — CollectFunc/ProcessFunc around a
bounded channel); Structured Streaming's micro-batch loop is that
runtime, and the engine's Layer-B operators are the process step. This
module is where they meet: the quality → split curation gate runs per
micro-batch inside ``foreachBatch``, built from the SAME row-local
expression lists the batch queries use (llm/text.py quality_exprs,
llm/filtering.py split_exprs) — batch/stream equivalence by
construction, asserted in tests/test_streaming.py.

Scale shape: the gate is map-only (no per-batch shuffle, no state
store), so streaming ingest throughput is bounded by source read rate,
not by the gate. Stateful curation stages (cross-batch dedup) belong to
the signature-store pattern instead: each micro-batch joins
llm/dedup.py's persisted band-signature store exactly like a batch drop
(q_dedup_incremental), which is why the gate itself stays stateless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from asyncdatapipeline_spark.llm.filtering import split_exprs
from asyncdatapipeline_spark.llm.text import quality_exprs


def curation_gate(df: DataFrame) -> DataFrame:
    """quality-score → filter → split-assign, over one micro-batch or a
    whole corpus — the same plan either way (all row-local exprs)."""
    return (
        df.select("doc_id", *quality_exprs(), *split_exprs())
        .filter("passes_quality")
        .select("doc_id", "n_words", "stopword_ratio", "bucket", "split")
    )


def start_curation_stream(stream_df: DataFrame, sink_path: str, checkpoint: str):
    """Run the curation gate over a streaming documents source via
    ``foreachBatch``, appending survivors to a parquet sink.

    foreachBatch (not a plain writeStream) because a real gate fans out
    per split — train/valid/test land in different tables — and because
    it reuses the *batch* writer (idempotent by batchId on retry).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        curation_gate(batch_df).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(sink_path)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def incremental_dedup_batch(batch_df: DataFrame, store: DataFrame) -> DataFrame:
    """One micro-batch of new documents joined against the persisted
    band-signature store — q_dedup_incremental's exact per-batch step,
    runnable inside ``foreachBatch``: each micro-batch is a (small)
    drop, the store is the 100 TB side and is only ever scanned.
    """
    from asyncdatapipeline_spark.llm.dedup import _band_key_rows

    batch = _band_key_rows(batch_df, batch_df.sparkSession)
    return (
        batch.alias("b")
        .join(store.alias("s"), F.col("b.band_key") == F.col("s.band_key"))
        .groupBy(
            F.col("b.doc_id").alias("new_doc_id"),
            F.col("s.doc_id").alias("store_doc_id"),
        )
        .agg(F.count(F.lit(1)).alias("shared_bands"))
    )


def start_incremental_dedup_stream(
    stream_df: DataFrame, store: DataFrame, sink_path: str, checkpoint: str
):
    """Stream new documents through the signature-store dedup: per
    micro-batch, candidate (new, store) pairs append to the sink. The
    streaming twin of the batch q_dedup_incremental call — the same
    join, driven by the micro-batch loop instead of a daily drop."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        incremental_dedup_batch(batch_df, store).write.mode("append").parquet(
            sink_path
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def semantic_dedup_batch(batch_df: DataFrame, store_cells: DataFrame,
                         centers: list) -> DataFrame:
    """One micro-batch of new embeddings against the persisted
    cell-keyed corpus — q_dedup_semantic_incremental's per-batch step,
    runnable inside ``foreachBatch``: the batch assigns its own
    (cell, cellb) key map-only against the broadcast centroid list and
    joins ONLY its keys' store partitions; per-vector verdict out.
    """
    from asyncdatapipeline_spark.llm.dedup import (
        _SEM_COS_THRESHOLD,
        _sem_dot,
    )
    from asyncdatapipeline_spark.llm.similarity import _as_double

    # same argmin/argmin2 construction as the batch path, against the
    # centers snapshot the stream was started with
    from asyncdatapipeline_spark.llm.similarity import _sqdist_expr

    v = _as_double(F.col("embedding"))
    dist_arr = F.array(*[_sqdist_expr(v, c) for c in centers])

    def argmins(t):
        da = t["da"]
        first = F.array_position(da, F.array_min(da)) - 1
        masked = F.transform(
            da,
            lambda x, i: F.when(i == first, F.lit(float("inf"))).otherwise(x),
        )
        return F.struct(
            first.cast("long").alias("cell"),
            (F.array_position(masked, F.array_min(masked)) - 1)
            .cast("long")
            .alias("cellb"),
        )

    bound = F.element_at(
        F.transform(F.array(F.struct(dist_arr.alias("da"))), argmins), 1
    )
    b = batch_df.select(
        F.col("vec_id").alias("b_id"),
        v.alias("bv"),
        bound.getField("cell").alias("b_cell"),
        bound.getField("cellb").alias("b_cellb"),
    ).withColumn("bn", F.sqrt(_sem_dot(F.col("bv"), F.col("bv"))))
    s = store_cells.select(
        F.col("cell").alias("s_cell"),
        F.col("cellb").alias("s_cellb"),
        F.col("v").alias("sv"),
    ).withColumn("sn", F.sqrt(_sem_dot(F.col("sv"), F.col("sv"))))
    cos = _sem_dot(F.col("bv"), F.col("sv")) / (F.col("bn") * F.col("sn"))
    hits = (
        b.join(
            s,
            (F.col("b_cell") == F.col("s_cell"))
            & (F.col("b_cellb") == F.col("s_cellb")),
        )
        .filter(cos >= _SEM_COS_THRESHOLD)
        .groupBy(F.col("b_id"))
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    return (
        b.select("b_id", "b_cell")
        .join(hits, "b_id", "left")
        .select(
            F.col("b_id").alias("vec_id"),
            F.col("b_cell").alias("cell"),
            F.coalesce("n_matches", F.lit(0).cast("long")).alias("n_matches"),
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("is_dup"),
        )
    )


def start_semantic_dedup_stream(
    stream_df: DataFrame,
    store_cells: DataFrame,
    centers: list,
    sink_path: str,
    checkpoint: str,
):
    """Stream new embeddings through semantic dedup: per micro-batch
    verdicts append to the sink — the streaming twin of
    q_dedup_semantic_incremental, same join driven by the micro-batch
    loop. The centroid list is a START-time snapshot (index rebuilds
    are a batch concern, like signature-store compaction)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        semantic_dedup_batch(batch_df, store_cells, centers).write.mode(
            "append"
        ).parquet(sink_path)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def start_cdc_apply_stream(
    stream_df: DataFrame, state_path: str, checkpoint: str
):
    """Stream CDC feed events into a maintained current-state table —
    the streaming twin of q_cdc_apply (operators/cdc.py): per
    micro-batch, prior state ∪ batch reduces through the same
    ``cdc_merge`` max_by aggregate and rewrites the state. Because the
    merge is associative/commutative in seq, ANY partitioning of the
    feed into micro-batches, in ANY arrival order, converges to the
    batch result — asserted by the equivalence test. Tombstones stay
    IN the state (a late lower-seq update must still lose to an
    earlier-arrived delete); readers filter ``op != 'D'``.

    The state restates through the GENERATION commit protocol
    (sources/generations.py, round 7): each micro-batch reads the
    current committed generation and writes the merged state as a NEW
    generation directory, visible only once its ``_COMMITTED`` marker
    lands — a crash at any point mid-write leaves the prior
    generation current (kill-mid-write pytest in
    tests/test_round7_ops.py). Reading and writing different
    directories also removes the old ``localCheckpoint``
    materialization (and its extra state copy) entirely. A table
    format (Delta/Iceberg) is this same protocol with manifests.
    Read the state back with :func:`read_cdc_state`.
    """
    from asyncdatapipeline_spark.operators.cdc import cdc_merge
    from asyncdatapipeline_spark.sources.generations import (
        commit_generation,
        latest_generation,
    )

    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        new_events = batch_df.select("k", "op", "price", "status", "seq")
        # latest_generation is an FS probe, not a try/except around the
        # read: a transient read failure must fail the micro-batch and
        # retry, never masquerade as "first batch" and drop state.
        current = latest_generation(spark, state_path)
        if current is not None:
            prior = spark.read.parquet(current).select(
                "k", "op", "price", "status", "seq"
            )
            feed = prior.unionByName(new_events)
        else:
            feed = new_events
        merged = cdc_merge(feed).select(
            "k",
            F.col("v.op").alias("op"),
            F.col("v.price").alias("price"),
            F.col("v.status").alias("status"),
            F.col("v.seq").alias("seq"),
        )
        commit_generation(merged, state_path, keep=2)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_cdc_state(spark, state_path: str) -> DataFrame:
    """Current committed CDC state (tombstones included — filter
    ``op != 'D'`` for the live view). Raises if no generation has ever
    committed."""
    from asyncdatapipeline_spark.sources.generations import (
        latest_generation,
    )

    current = latest_generation(spark, state_path)
    if current is None:
        raise FileNotFoundError(
            f"no committed generation under {state_path}"
        )
    return spark.read.parquet(current)


_GAP_OUT_SCHEMA = (
    "event_type string, gap_start timestamp, gap_end timestamp,"
    " gap_seconds long"
)
_GAP_STATE_SCHEMA = "last_ep long"


def start_gap_monitor_stream(
    stream_df: DataFrame,
    sink_path: str,
    checkpoint: str,
    threshold_s: int = 3600,
):
    """Streaming outage detector: per event_type, emit a row for every
    silent gap longer than ``threshold_s`` — q_events_outage's
    streaming twin, and the engine's product-level
    ``applyInPandasWithState`` operator (true cross-batch KEYED STATE:
    the last-seen timestamp must survive micro-batch boundaries, or a
    gap that spans two batches is silently missed — exactly what the
    equivalence test plants). The freshness monitor every ingest
    pipeline wants PUSHED, not polled.

    State is one integer per key (the last epoch-second seen) — the
    minimal-state shape that scales to any key cardinality; the whole
    micro-batch's rows sort by time BEFORE the fold (Arrow delivers a
    large key as multiple chunks — per-chunk sorting would miss gaps
    spanning chunks and regress the watermark), and
    emission is append-only so the sink is replay-idempotent under the
    checkpoint.
    """
    import pandas as pd

    def detect(key, pdfs, state):
        last = state.get[0] if state.exists else None
        # Gather EVERY chunk before sorting: a large key arrives as
        # multiple Arrow chunks and per-chunk sorting would process
        # rows out of time order across chunk boundaries (missing a
        # real gap and regressing the watermark on a late chunk).
        eps = sorted(
            int(pd.Timestamp(ts).timestamp())
            for pdf in pdfs
            for ts in pdf["ts"]
        )
        out = []
        for ep in eps:
            if last is not None and ep - last > threshold_s:
                out.append(
                    (
                        key[0],
                        pd.Timestamp(last, unit="s"),
                        pd.Timestamp(ep, unit="s"),
                        ep - last,
                    )
                )
            if last is None or ep > last:
                last = ep
        state.update((last,))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "event_type",
                    "gap_start",
                    "gap_end",
                    "gap_seconds",
                ],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    gaps = (
        stream_df.select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            detect,
            outputStructType=_GAP_OUT_SCHEMA,
            stateStructType=_GAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        gaps.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
