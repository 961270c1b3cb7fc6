"""The campaign scheduler: micro-batch crawl waves over the pending frontier.

This is the Spark-native replacement for the reference's whole control plane —
url_sender.py's batch loop (BATCH_SIZE waves, url_sender.py:47-49, 228-287),
the Celery/Redis queues (vv8_worker/app.py:30-41), per-URL progress pickle
checkpointing (url_sender.py:146-200), and retry-once (url_sender.py:242-253)
— collapsed into one deterministic DataFrame loop with atomic per-wave
commits (catalog.ParquetCatalog; Iceberg semantics).

Per wave:
    pending ->(select_wave: politeness windows + top-k)-> wave rows
            ->(fetch_verify: semi-join-pruned images join + Arrow UDF)-> fetches
    commit atomically: append fetches/url_seen/metrics/lineage,
                       rewrite pending = pending - selected + retries,
                       watermark = wave_id.

Exactly-once resume: every wave is a pure function of the previous committed
snapshot, and the manifest swap is atomic — kill the driver anywhere and a
restart re-runs at most the in-flight wave, producing byte-identical tables
(C8, url_sender.py:146-200 semantics, minus the pickle).

The loop is micro-batch by construction ("Trigger.AvailableNow per wave");
there is no unbounded external stream in the reference either — its waves are
time-gated reads of a static seed list.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..catalog import ParquetCatalog
from ..operators.dedup import prepare_frontier
from ..operators.fetch import fetch_verify
from ..operators.waves import select_wave
from ..simulator import RETRYABLE

TABLE_SCHEMAS = {
    "frontier_prepared": schemas.FRONTIER_PREPARED,
    "pending": schemas.PENDING,
    "fetches": schemas.FETCHES,
    "rejected": schemas.REJECTED,
    "metrics": schemas.METRICS,
}


def url_seen_df(cat: ParquetCatalog) -> DataFrame:
    """The URL-seen set (backend tasks.py:148-156 analog) — a projection of
    the committed fetch ledger, not a second sink: one less write per wave,
    and it can never disagree with fetches."""
    return (
        cat.read("fetches")
        .filter(F.col("attempt") == 1)
        .select(
            "canon_url", F.xxhash64("canon_url").alias("url_hash64"), "wave_id"
        )
    )


def lineage_df(cat: ParquetCatalog) -> DataFrame:
    """Per-(wave, executor-partition) lineage for resume audit — derived from
    the partition_id column stamped by the fetch stage."""
    return (
        cat.read("fetches")
        .groupBy("wave_id", "partition_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("status") == "OK", 1).otherwise(0)).alias("n_ok"),
        )
    )


@dataclass
class CrawlConfig:
    batch_size: int = 1000
    default_budget: int = 25
    salt_width: int = 8
    max_waves: int = 10_000


def open_catalog(spark: SparkSession, root: str) -> ParquetCatalog:
    return ParquetCatalog(spark, root, TABLE_SCHEMAS)


def run_campaign(
    spark: SparkSession,
    catalog_root: str,
    frontier: DataFrame,
    robots: DataFrame,
    images: DataFrame,
    cfg: CrawlConfig = CrawlConfig(),
    stop_after_waves: int | None = None,
) -> ParquetCatalog:
    """Run (or resume) a campaign to completion. ``stop_after_waves`` kills
    the loop early — used by the kill/resume test. Calling again with the
    same catalog_root resumes from the committed watermark."""
    cat = open_catalog(spark, catalog_root)

    if not cat.prepared():
        # stage 1: the expensive pass (canonicalize + dedup window + robots
        # gate) computed ONCE and committed; stage 2 derives pending/rejected
        # by scanning the committed files — no recompute. Both stages write
        # to deterministic paths, so a kill between them re-runs cleanly.
        cat.commit("prep", appends={"frontier_prepared": prepare_frontier(frontier, robots)})
        fp = cat.read("frontier_prepared")
        cat.commit(
            "prep",
            appends={
                "rejected": schemas.conform(
                    fp.filter(F.col("reason").isNotNull()), schemas.REJECTED
                )
            },
            replaces={
                "pending": schemas.conform(fp.filter(F.col("reason").isNull()), schemas.PENDING)
            },
            prepared=True,
        )

    wave_id = cat.watermark() + 1
    waves_done = 0
    while wave_id < cfg.max_waves:
        if stop_after_waves is not None and waves_done >= stop_after_waves:
            break
        t0 = time.perf_counter()
        pending = cat.read("pending")
        # select_wave necessarily funnels through one partition to assign
        # order_in_wave (bounded <= batch_size rows); re-spread the wave so
        # the fetch UDF uses every core instead of one.
        selected = (
            select_wave(
                pending, robots, wave_id, cfg.batch_size, cfg.default_budget, cfg.salt_width
            )
            .repartition(spark.sparkContext.defaultParallelism, "canon_url")
            .persist()
        )
        # no separate emptiness check: the one aggregate below both counts
        # the wave and detects termination (one Spark job instead of two)
        results = fetch_verify(selected, images).persist()
        agg = results.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("status") == "OK", 1).otherwise(0)).alias("ok"),
        ).collect()[0]
        n_attempted, n_ok = int(agg["n"]), int(agg["ok"] or 0)
        if n_attempted == 0:
            selected.unpersist()
            results.unpersist()
            break

        bad = results.filter(
            (F.col("attempt") == 1) & F.col("status").isin(*RETRYABLE)
        ).select("canon_url")
        retries = schemas.conform(
            selected.join(F.broadcast(bad), "canon_url", "left_semi").withColumn(
                "attempt", F.lit(2)
            ),
            schemas.PENDING,
        )
        new_pending = pending.join(
            F.broadcast(selected.select("canon_url")), "canon_url", "left_anti"
        ).unionByName(retries)

        wall = time.perf_counter() - t0
        metrics = spark.createDataFrame(
            [
                (
                    wave_id,
                    n_attempted,
                    n_ok,
                    n_attempted - n_ok,
                    wall,
                    n_attempted / wall if wall > 0 else 0.0,
                )
            ],
            schemas.METRICS,
        ).coalesce(1)

        cat.commit(
            f"wave={wave_id}",
            appends={"fetches": results, "metrics": metrics},
            replaces={"pending": new_pending},
            watermark=wave_id,
        )
        selected.unpersist()
        results.unpersist()
        wave_id += 1
        waves_done += 1
    return cat


def add_seeds(
    spark: SparkSession,
    cat: ParquetCatalog,
    new_frontier: DataFrame,
    robots: DataFrame,
    fpp: float = 0.01,
) -> dict:
    """Incremental seed ingest into a live/finished campaign — the rebuild of
    the reference's always-on submit path: new URLs arrive while a campaign
    runs (resend_script_ids.py:59-99 poll loop, C10) and each is checked
    against the crawl cache first (backend tasks.py:148-156, D1: a hit
    returns the cached submission instead of re-crawling).

    The cache check is where 10^10 scale bites: an exact anti-join of every
    ingest batch against the full ``url_seen`` table reshuffles the seen set
    each time. Here the broadcast Bloom filter (operators/bloom.py) screens
    the batch first — bloom-negative rows (the vast majority of genuinely
    new URLs) skip the join entirely; only bloom-positive rows take the
    exact join, so exactness is preserved while the join's probe side
    shrinks to (dup_rate + fpp) of the batch.

    New rows are re-sequenced after every seq already in the catalog, so one
    global crawl order (seq) stays total and deterministic across ingests.
    Returns counts: {added, cached, enqueued, invalid, duplicate, robots}.
    """
    from ..operators.bloom import build_bloom, with_bloom_maybe

    pending = cat.read("pending")
    fetches = cat.read("fetches")
    rejected = cat.read("rejected")

    base = (
        pending.select(F.max("seq").alias("m"))
        .unionByName(fetches.select(F.max("seq").alias("m")))
        .unionByName(rejected.select(F.max("seq").alias("m")))
        .agg(F.max("m"))
        .collect()[0][0]
    )
    base = int(base) + 1 if base is not None else 0

    prep = prepare_frontier(
        new_frontier.withColumn("seq", F.col("seq") + F.lit(base)), robots
    ).persist()
    batch_rejects = schemas.conform(prep.filter(F.col("reason").isNotNull()), schemas.REJECTED)
    cand = schemas.conform(prep.filter(F.col("reason").isNull()), schemas.PENDING)

    # the "crawl cache": all first-attempt urls ever fetched (cached) plus
    # urls already enqueued but not yet crawled (enqueued). A retried url is
    # in both — 'cached' wins ('a'<'e'), matching the reference's cache-hit.
    known = (
        url_seen_df(cat).select("canon_url").withColumn("why", F.lit("cached"))
        .unionByName(pending.select("canon_url").withColumn("why", F.lit("enqueued")))
        .groupBy("canon_url")
        .agg(F.min("why").alias("why"))
    )
    bf = build_bloom(known, "canon_url", fpp=fpp)
    flagged = with_bloom_maybe(cand, bf).persist()
    clean = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = flagged.filter(F.col("maybe_seen")).drop("maybe_seen").join(known, "canon_url", "left")
    fresh = schemas.conform(
        clean.unionByName(suspect.filter(F.col("why").isNull()).drop("why")), schemas.PENDING
    )
    cache_hits = schemas.conform(
        suspect.filter(F.col("why").isNotNull()).withColumn("url", F.col("canon_url")).withColumn("reason", F.col("why")),
        schemas.REJECTED,
    )

    tag = f"seeds-{cat.file_sets('rejected')}"
    counts = {
        "added": fresh.count(),
        **{
            r["reason"]: r["n"]
            for r in batch_rejects.unionByName(cache_hits)
            .groupBy("reason")
            .agg(F.count("*").alias("n"))
            .collect()
        },
    }
    cat.commit(
        tag,
        appends={"rejected": batch_rejects.unionByName(cache_hits)},
        replaces={"pending": pending.unionByName(fresh)},
    )
    prep.unpersist()
    flagged.unpersist()
    return counts


def crawl_order_df(cat: ParquetCatalog) -> DataFrame:
    """(canon_url, wave_id, order_in_wave) for first attempts — the golden
    crawl-order tuple compared against the simulator."""
    return (
        cat.read("fetches")
        .filter(F.col("attempt") == 1)
        .select("canon_url", "wave_id", "order_in_wave")
    )
