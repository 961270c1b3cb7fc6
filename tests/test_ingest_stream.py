"""Structured-Streaming seed ingest (streaming/ingest.py): seed files ->
micro-batches -> add_seeds, drained with Trigger.AvailableNow; replayed
batches must be idempotent against the crawl cache."""

import os

from pyspark.sql import functions as F

from visiblev8_crawler_spark.streaming import ingest, scheduler
from visiblev8_crawler_spark.streaming.scheduler import CrawlConfig


def test_stream_ingest_then_crawl(spark, world, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cat_stream"))
    seed_dir = str(tmp_path_factory.mktemp("seeds"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    frontier = spark.read.parquet(world["paths"]["frontier"])
    robots = spark.read.parquet(world["paths"]["robots"])
    images = spark.read.parquet(world["paths"]["images"])
    cfg = CrawlConfig(batch_size=150)
    cat = scheduler.run_campaign(spark, root, frontier, robots, images, cfg)
    seen_before = {r["canon_url"] for r in scheduler.url_seen_df(cat).collect()}

    fresh = [f"https://streamed.example/img/img_{i:012d}" for i in range(6)]
    dup = next(iter(seen_before))
    with open(os.path.join(seed_dir, "batch1.txt"), "w") as f:
        f.write("\n".join(fresh[:3] + [dup, ""]) + "\n")
    with open(os.path.join(seed_dir, "batch2.txt"), "w") as f:
        f.write("\n".join(fresh[3:]) + "\n")

    q = ingest.run_ingest_stream(spark, cat, seed_dir, robots, ckpt)
    q.awaitTermination(120)

    pending = scheduler.pending_df(cat)
    got = {r["canon_url"] for r in pending.collect()}
    assert set(fresh) <= got, "streamed fresh urls must be schedulable"
    reasons = {
        r["reason"]
        for r in cat.read("rejected").filter(F.col("url") == dup).collect()
    }
    assert "cached" in reasons, "replayed/duplicate submit must hit the crawl cache"

    # drain the crawl; every streamed url fetched exactly once
    cat = scheduler.run_campaign(spark, root, frontier, robots, images, cfg)
    n = (
        cat.read("fetches")
        .filter(F.col("canon_url").isin(*fresh) & (F.col("attempt") == 1))
        .count()
    )
    assert n == len(fresh)

    # idempotent replay: a second stream over the same dir + a NEW checkpoint
    # (forced redelivery) must not re-enqueue anything
    ckpt2 = str(tmp_path_factory.mktemp("ckpt2"))
    q2 = ingest.run_ingest_stream(spark, cat, seed_dir, robots, ckpt2)
    q2.awaitTermination(120)
    assert scheduler.pending_df(cat).count() == 0
