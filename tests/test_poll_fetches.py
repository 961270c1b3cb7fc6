"""jobs/poll_fetches.py — the incremental ledger forwarder (the reference's
resend poll loop, resend_script_ids.py:59-99, rebuilt on catalog.poll()).
Invariant under test after every step: the union of forwarded batches
equals the fetch ledger EXACTLY — no duplicate, no loss — through resumes,
compactions (rebaseline), and a forwarder crash between batch write and
cursor save."""

import os
import shutil

from jobs.poll_fetches import load_cursor, poll_once
from visiblev8_crawler_spark.streaming import scheduler
from visiblev8_crawler_spark.streaming.scheduler import CrawlConfig

KEY = ["canon_url", "attempt", "wave_id", "order_in_wave", "status"]


def _batches(spark, out):
    dirs = [
        os.path.join(out, d) for d in sorted(os.listdir(out)) if d.startswith("batch_")
    ]
    rows = []
    for d in dirs:
        rows += [tuple(r[k] for k in KEY) for r in spark.read.parquet(d).select(*KEY).collect()]
    return rows


def _ledger(cat):
    return [tuple(r[k] for k in KEY) for r in cat.read("fetches").select(*KEY).collect()]


def test_forwarder_exactly_once_through_resume_compaction_and_crash(
    spark, world, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("poll_campaign"))
    out = str(tmp_path_factory.mktemp("poll_out"))
    frontier = spark.read.parquet(world["paths"]["frontier"])
    robots = spark.read.parquet(world["paths"]["robots"])
    images = spark.read.parquet(world["paths"]["images"])
    cfg = CrawlConfig(batch_size=150)

    # stage 1: partial campaign, first forward = the full ledger so far
    cat = scheduler.run_campaign(
        spark, root, frontier, robots, images, cfg, stop_after_waves=2
    )
    step = poll_once(cat, "fetches", out)
    assert step["rows"] > 0 and not step["rebaselined"]
    assert sorted(_batches(spark, out)) == sorted(_ledger(cat))

    # idempotent when nothing new committed
    assert poll_once(cat, "fetches", out)["rows"] == 0

    # stage 2: resume the campaign; forward must pick up ONLY the new waves
    cat = scheduler.run_campaign(
        spark, root, frontier, robots, images, cfg, stop_after_waves=2
    )
    before = len(_batches(spark, out))
    step = poll_once(cat, "fetches", out)
    assert step["rows"] > 0 and not step["rebaselined"]
    assert len(_batches(spark, out)) == before + step["rows"]
    assert sorted(_batches(spark, out)) == sorted(_ledger(cat))

    # stage 3: crash between batch write and cursor save — simulate by
    # planting an orphan batch beyond the committed cursor; the next poll
    # must drop it, not double-count it
    cur = load_cursor(out, "fetches")
    orphan = os.path.join(out, f"batch_fetches_{cur + 99:08d}")
    src = next(os.path.join(out, d) for d in os.listdir(out) if d.startswith("batch_"))
    shutil.copytree(src, orphan)
    cat = scheduler.run_campaign(
        spark, root, frontier, robots, images, cfg, stop_after_waves=1
    )
    poll_once(cat, "fetches", out)
    assert not os.path.exists(orphan)
    assert sorted(_batches(spark, out)) == sorted(_ledger(cat))

    # stage 4: compaction crosses an epoch — the forwarder rebaselines
    # (resets its batches, re-forwards the full table once) and stays exact
    assert cat.compact("fetches", min_file_sets=2)
    step = poll_once(cat, "fetches", out)
    assert step["rebaselined"]
    assert sorted(_batches(spark, out)) == sorted(_ledger(cat))

    # stage 5: drain the campaign; post-rebaseline polling is delta-only
    cat = scheduler.run_campaign(spark, root, frontier, robots, images, cfg)
    step = poll_once(cat, "fetches", out)
    assert not step["rebaselined"]
    assert sorted(_batches(spark, out)) == sorted(_ledger(cat))
    assert scheduler.pending_df(cat).count() == 0
