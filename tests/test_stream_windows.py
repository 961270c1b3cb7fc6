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
