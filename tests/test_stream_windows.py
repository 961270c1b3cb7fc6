"""Streaming ≡ batch for the watermarked windowed aggregation
(streaming/windows.py): Trigger.AvailableNow over the static events table
must equal the batch groupBy — Structured Streaming's incrementalized-batch
contract."""

import os

from visiblev8_crawler_spark.streaming import windows

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_stream_equals_batch(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("wck"))
    # the file stream source needs a directory; the testdata table is a file
    events_dir = str(tmp_path_factory.mktemp("evdir"))
    os.symlink(f"{SF_DIR}/events.parquet", os.path.join(events_dir, "events.parquet"))
    q = windows.run_windowed_stream(spark, events_dir, ckpt)
    q.awaitTermination(120)

    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM windowed_events").collect()
    }
    batch = windows.windowed_event_counts(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    ).collect()
    want = {(r["win_start"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch}
    assert got == want
    assert len(got) > 10


def test_update_mode_sink_drops_late_rows_and_evicts_state(spark, tmp_path_factory):
    """The PRODUCTION metrics-plane shape (run_metrics_stream_update):
    outputMode('update') + watermark over a catalog-table sink. Batch 0
    (file 1, maxFilesPerTrigger=1) processes six hours of on-time events;
    batch 1 (file 2) is an on-time filler; batch 2 (file 3) delivers one
    row five hours behind the watermark (must be DROPPED), one row that
    UPDATES an already-emitted window (the upsert path), and one fresh
    window. Final table = batch aggregation over everything EXCEPT the late
    row. Batching subtleties this fixture encodes: the learned watermark is
    persisted with the NEXT batch's offsets (a single-batch run never
    records it), and the late-data filter runs one batch BEHIND the
    eviction watermark — so the late row must arrive two batches after the
    rows that establish its horizon."""
    import time
    from datetime import datetime, timedelta

    from visiblev8_crawler_spark.streaming.windows import (
        run_metrics_stream_update,
        windowed_event_counts,
    )

    base = datetime(2026, 1, 1, 0, 0, 0)
    ckpt = str(tmp_path_factory.mktemp("uck"))
    events_dir = str(tmp_path_factory.mktemp("uevdir"))
    cat_root = str(tmp_path_factory.mktemp("ucat"))
    ddl = "event_id long, user_id long, event_type string, value double, ts timestamp"

    def rows_df(rows):
        return spark.createDataFrame(
            [(i, 1, t, v, base + timedelta(minutes=m)) for i, (t, v, m) in enumerate(rows)],
            ddl,
        )

    # file 1: 6 hours of on-time events -> watermark lands at 05:35-30min
    on_time = [("fetch", 1.0, 60 * h + 5) for h in range(6)] + [
        ("ok", 2.0, 60 * h + 35) for h in range(6)
    ]
    rows_df(on_time).coalesce(1).write.mode("append").parquet(events_dir)
    time.sleep(1.1)  # mtime ordering: one file per batch
    filler = ("fetch", 1.5, 60 * 5 + 50)  # on-time; merges into (05:00, fetch)
    rows_df([filler]).coalesce(1).write.mode("append").parquet(events_dir)
    time.sleep(1.1)
    # file 3: late (00:06, far below the watermark), an update to the
    # existing (05:00, ok) window, and a brand-new 06:00 window
    late = ("fetch", 100.0, 6)
    upd = ("ok", 5.0, 60 * 5 + 40)
    fresh = ("fetch", 3.0, 60 * 6 + 5)
    rows_df([late, upd, fresh]).coalesce(1).write.mode("append").parquet(events_dir)

    q = run_metrics_stream_update(
        spark, events_dir, ckpt, cat_root, "30 minutes", max_files_per_trigger=1
    )
    q.awaitTermination(120)
    # the late row was dropped at the state operator, the watermark EVICTED
    # the closed windows' state (10 of the 12 windows end before 05:05),
    # and the remaining state stays bounded — the properties complete mode
    # cannot give a long-lived stream
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped >= 1, "the late row was not dropped by the watermark"
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert removed >= 10, f"watermark never evicted window state ({removed})"
    final_state = max(
        op.get("numRowsTotal", 0)
        for p in q.recentProgress[-2:]
        for op in p["stateOperators"]
    )
    assert final_state <= 3, f"state not bounded by the watermark ({final_state})"

    from visiblev8_crawler_spark.catalog import ParquetCatalog
    from visiblev8_crawler_spark.schemas import METRICS_WINDOWS

    cat = ParquetCatalog(spark, cat_root, {"metrics_windows": METRICS_WINDOWS})
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in cat.read("metrics_windows").collect()
    }
    want_rows = rows_df(on_time).unionByName(rows_df([filler, upd, fresh]))
    want = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_event_counts(want_rows).collect()
    }
    assert got == want  # late row contributed nothing; upsert + fresh did


def test_dedup_stream_drops_replayed_events(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark: a second file replaying half the
    events (the at-least-once transport case) adds nothing — the streamed
    result equals the batch distinct over event_id."""
    import pyspark.sql.functions as F

    ckpt = str(tmp_path_factory.mktemp("dck"))
    events_dir = str(tmp_path_factory.mktemp("devdir"))
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src.write.mode("overwrite").parquet(events_dir)
    # replay: the same events delivered again as extra files in the dir
    src.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(events_dir)

    q = windows.run_dedup_stream(spark, events_dir, ckpt)
    q.awaitTermination(120)

    got = [r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_events").collect()]
    want = {r["event_id"] for r in src.select("event_id").distinct().collect()}
    assert len(got) == len(set(got)), "a replayed event leaked through"
    assert set(got) == want


def test_session_stream_equals_batch_and_append_withholds_open_tail(
    spark, tmp_path_factory
):
    """Streaming session_window ≡ batch (complete mode), and append mode
    emits exactly the watermark-FINALIZED sessions: the trailing
    still-open sessions (session_end > final watermark) are withheld —
    the state-eviction contract a production unbounded stream relies on."""
    import pyspark.sql.functions as F

    events_dir = str(tmp_path_factory.mktemp("sessdir"))
    os.symlink(f"{SF_DIR}/events.parquet", os.path.join(events_dir, "events.parquet"))

    q = windows.run_session_stream(
        spark, events_dir, str(tmp_path_factory.mktemp("sck1"))
    )
    q.awaitTermination(120)
    complete = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in spark.sql("SELECT * FROM session_events").collect()
    }

    batch = windows.session_event_rollup(spark.read.parquet(events_dir))
    want = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in batch.collect()
    }
    assert complete == want and len(complete) > 0

    q2 = windows.run_session_stream(
        spark,
        events_dir,
        str(tmp_path_factory.mktemp("sck2")),
        output_mode="append",
        query_name="session_events_append",
    )
    q2.awaitTermination(120)
    appended = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in spark.sql("SELECT * FROM session_events_append").collect()
    }
    max_ts = spark.read.parquet(events_dir).agg(
        F.max(F.col("ts").cast("timestamp"))
    ).collect()[0][0]
    import datetime

    final_wm = max_ts - datetime.timedelta(minutes=30)
    withheld = {k: v for k, v in complete.items() if v[0] > final_wm}
    emitted = {k: v for k, v in complete.items() if v[0] <= final_wm}
    assert appended == emitted, (len(appended), len(emitted))
    assert len(withheld) >= 1  # the tail session really was open


def test_enrichment_stream_equals_batch_with_left_nulls(spark, tmp_path_factory):
    """Stream-static join ≡ the same batch join, row for row — including
    LEFT-join semantics: an event type missing from the dimension comes
    through with null enrichment, never dropped."""
    import pyspark.sql.functions as F

    events_dir = str(tmp_path_factory.mktemp("enrdir"))
    os.symlink(f"{SF_DIR}/events.parquet", os.path.join(events_dir, "events.parquet"))

    ev = spark.read.parquet(events_dir)
    types = sorted(r["event_type"] for r in ev.select("event_type").distinct().collect())
    assert len(types) >= 2
    # dimension deliberately misses the LAST type to exercise the left join
    dim = spark.createDataFrame(
        [(t, f"cat_{i % 2}", float(i + 1)) for i, t in enumerate(types[:-1])],
        "event_type string, category string, weight double",
    )

    q = windows.run_enrichment_stream(
        spark, events_dir, str(tmp_path_factory.mktemp("eck")), dim
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: (r["user_id"], r["event_type"], r["category"], r["weight"], r["value"])
        for r in spark.sql("SELECT * FROM enriched_events").collect()
    }
    want = {
        r["event_id"]: (r["user_id"], r["event_type"], r["category"], r["weight"], r["value"])
        for r in ev.join(F.broadcast(dim), "event_type", "left")
        .select("event_id", "user_id", "event_type", "category", "weight", "value")
        .collect()
    }
    assert got == want and len(got) == ev.count()
    missed = [v for v in got.values() if v[1] == types[-1]]
    assert missed and all(v[2] is None and v[3] is None for v in missed)
