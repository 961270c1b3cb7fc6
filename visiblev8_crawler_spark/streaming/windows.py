"""Watermarked windowed aggregation over an event stream — the Structured
Streaming form of the engine's wave/metrics rollups.

Reference parity: the reference's only "streaming" aggregation is campaign
counters accumulated per wave (url_sender.py:242-257, 279-303) over a
time-gated batch loop. The Spark-native generalization is an event-time
tumbling window with a watermark bounding lateness:

    readStream(events) -> withWatermark(ts) -> groupBy(window(ts), type)
      -> count/sum -> sink

Mode semantics (be precise, they differ): in ``update``/``append`` output
modes the watermark bounds state and drops rows later than the watermark —
the semantics a long-lived fetch-metrics stream needs when executor clocks
skew (a worker reporting a fetch 10 minutes late must not reopen a closed
wave's accounting). ``run_windowed_stream`` below deliberately uses
``complete`` mode + a memory sink as the TEST-ONLY shape: complete mode
keeps all window state and the watermark is inert, which is exactly what
lets the batch-equivalence test compare the full result; a production
deployment swaps in outputMode('update') with a table sink so state stays
bounded by the watermark.

Determinism note: with Trigger.AvailableNow over a static directory the
result equals the batch groupBy over the same files (tested in
tests/test_stream_windows.py) — which is Structured Streaming's core
contract (incrementalized batch query), and why the wave scheduler can be
reasoned about as plain DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """The aggregation itself — shared by the streaming and batch plans so
    the equivalence test compares the same logical query."""
    from pyspark.sql.types import TimestampType

    # the testdata's ts is TIMESTAMP_NTZ; watermarks require instant-typed
    # timestamps, and the cast is identical in the batch twin. Skip it when
    # ts is already instant-typed: re-projecting the column would REPLACE
    # the watermarked attribute, silently detaching the watermark from the
    # aggregation (no late-row drop, no state eviction — caught by
    # test_update_mode_sink_drops_late_rows_and_evicts_state).
    if not isinstance(events.schema["ts"].dataType, TimestampType):
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_dedup_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
):
    """Streaming exact dedup (the D1 seen-set as a STREAM operator):
    ``dropDuplicatesWithinWatermark`` keys state on event_id and the
    watermark bounds how long a key is remembered — the right semantics for
    an at-least-once transport (a replayed event inside the watermark is
    dropped; state does not grow forever, unlike an unbounded
    dropDuplicates). Batch-equivalence under Trigger.AvailableNow is tested
    in tests/test_stream_windows.py. Returns the StreamingQuery; results
    under view name 'dedup_events'."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        deduped.select("event_id", "user_id", "event_type")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_events")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_metrics_stream_update(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    catalog_root: str,
    watermark: str = "30 minutes",
    width: str = "1 hour",
    max_files_per_trigger: int | None = None,
):
    """The PRODUCTION shape of the always-on metrics plane (C12,
    url_sender.py:279-303): ``outputMode('update')`` + watermark, so

    - window state is EVICTED once the watermark passes a window's end
      (state stays bounded over an unbounded campaign — unlike the
      complete-mode test fixture, where the watermark is inert);
    - a row later than the watermark is DROPPED — a worker reporting a
      fetch 10 minutes late cannot reopen a closed wave's accounting
      (asserted via numRowsDroppedByWatermark in the test);
    - each micro-batch emits only the windows it CHANGED, and foreachBatch
      upserts them into a catalog table by (win_start, event_type) — the
      Iceberg ``MERGE INTO`` analog, atomic per batch via the manifest
      swap, so readers always see a consistent rollup.

    The watermark lives in the streaming checkpoint: a restarted query
    resumes with the same lateness horizon (tested by running two
    AvailableNow passes over a growing directory). Returns the
    StreamingQuery."""
    from ..catalog import ParquetCatalog
    from ..schemas import METRICS_WINDOWS

    cat = ParquetCatalog(spark, catalog_root, {"metrics_windows": METRICS_WINDOWS})
    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    agg = windowed_event_counts(stream.withWatermark("ts", watermark), width)

    def upsert(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)  # cut the stream lineage
        if not batch_df.isEmpty():
            old = cat.read("metrics_windows")
            merged = old.join(
                F.broadcast(batch_df.select("win_start", "event_type")),
                ["win_start", "event_type"],
                "left_anti",
            ).unionByName(batch_df)
            cat.commit(None, replaces={"metrics_windows": merged})

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_windowed_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    width: str = "1 hour",
):
    """File-stream the events table, aggregate per (tumbling window, type)
    with a watermark, emit to an in-memory sink. TEST SHAPE: complete mode
    keeps all windows (watermark inert) so the result is comparable to the
    batch twin; production = outputMode('update') + table sink, where the
    watermark evicts closed windows and bounds state (see module docstring).
    Returns the StreamingQuery; results under view name 'windowed_events'."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = windowed_event_counts(stream.withWatermark("ts", watermark), width)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("windowed_events")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_rollup_body(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """The ONE session aggregation shared by the batch query
    (plans.queries events_session_window, which keeps its TIMESTAMP_NTZ
    column uncast) and the streaming wrapper below (which must cast to an
    instant type for the watermark) — so the two plans cannot drift. The
    boundary rule (end-inclusive merge) is pinned in
    tests/test_queries_oracle.py."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_event_rollup(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session aggregation via the NATIVE ``F.session_window`` —
    the instant-typed form streaming needs (same contract as
    ``windowed_event_counts``: cast only when the column is not already
    instant-typed, to avoid detaching a watermark)."""
    from pyspark.sql.types import TimestampType

    if not isinstance(events.schema["ts"].dataType, TimestampType):
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return session_rollup_body(events, gap)


def run_session_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    gap: str = "30 minutes",
    output_mode: str = "complete",
    query_name: str = "session_events",
):
    """File-stream the events table into session_window state.

    Mode semantics (both tested): ``complete`` keeps every session and the
    watermark is inert — the TEST shape whose result equals the batch twin
    exactly. ``append`` is the PRODUCTION shape for an unbounded stream:
    a session row is emitted (and its state evicted) only once the
    watermark passes its end, so on a bounded AvailableNow run the
    trailing session(s) with session_end > max(ts) - watermark are
    correctly WITHHELD — still open as far as the stream knows. The
    equivalence test asserts append == complete minus exactly that set
    (update mode is not supported for session windows by Spark).
    Returns the StreamingQuery; results under ``query_name``."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = session_event_rollup(stream.withWatermark("ts", watermark), gap)
    return (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_enrichment_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    dim: DataFrame,
    query_name: str = "enriched_events",
):
    """Stream-static enrichment join — the third core Structured Streaming
    join shape after windowed aggregation and stateful dedup: each
    micro-batch of the event stream joins a STATIC dimension (here a
    per-event-type taxonomy; in the crawl plane this is exactly how the
    robots/politeness dimension would attach in a fully-streaming
    deployment). The static side is broadcast per micro-batch — no
    streaming state at all, so there is nothing to watermark and append
    mode emits every enriched row exactly once (batch-equivalence tested,
    including LEFT-join null-preservation for dimension misses).
    Returns the StreamingQuery; results under ``query_name``."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    enriched = stream.join(F.broadcast(dim), "event_type", "left").select(
        "event_id",
        "user_id",
        "event_type",
        "category",
        "weight",
        "value",
    )
    return (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
