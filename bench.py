"""Benchmark entry point (driver contract).

Runs the headline query suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus a crawl-campaign
throughput microbench on the synthetic world, and prints ONE JSON line:

    {"metric": "headline_suite_sec", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "runs": 3, "sf": <sf>,
     "crawl_rows_per_s": ...}

Per-query numbers are the MEDIAN of 3 back-to-back runs (round 4, VERDICT
r3 #7): the machine-drift A/B showed identical code spanning ±11% in one
session, so single-shot per-query numbers cannot support cross-round
comparisons. Medians damp that structurally. Note vs rounds 1-3: their
numbers were single first-execution timings (colder caches); the medians
here sit lower on queries whose first run pays shuffle-file or JIT warmup
— BASELINE.md §D records the switch.

Round 5 additions (VERDICT r4 #4/#8): ``queries_min``/``extra_queries_min``
carry the MIN of the same 3 runs — the less contention-sensitive statistic
on a shared box (an external tenant inflates median and mean; min survives
unless all 3 runs were hit) — and ``loadavg_start``/``loadavg_end`` record
/proc/loadavg so any number taken under host contention is self-flagging
(BASELINE.md §F's operational rule, now enforced in the artifact itself).

For the north-rule two-cluster-size scaling evidence (local[8] vs local[32])
run ``python bench_scaling.py`` — that needs two separate JVMs, so it can't
live inside this single-session bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "star_join_revenue",
    "top_k_orders",
    "pct_of_total_by_priority",
    "dedup_priority_pick",
    "window_running_total",
    "tumbling_window_events",
    "json_props_agg",
    "posexplode_tokens",
    "dedup_exact_docs",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_docs",
    "embedding_cosine_topk",
    "embedding_lsh_topk",
    "image_decode_dims",
]

# round-2 additions: reported under "extra_queries"/"extra_sec", never mixed
# into headline_suite_sec (cross-round comparability)
EXTRA = [
    "embedding_neardup_components",
    "events_sessionize",
    "tfidf_top_terms",
    "json_map_features",
    "image_phash_topk",
    "training_set_pipeline",
    # round 3
    "balanced_sample_docs",
    "ann_recall_report",
    "price_percentiles_approx",
    # round 4
    "embedding_lsh_multiprobe_topk",
    "benchmark_contamination",
    # round 5
    "doc_gopher_repetition",
    "doc_pii_scrub",
    "image_phash_neardup_pairs",
    "video_frame_overlap",
    "doc_neardup_canonicalize",
    "events_asof_join",
    "events_range_join",
    "embedding_quantize_int8",
    "embedding_quantized_topk",
    "customer_rollup",
    "docs_lang_pivot",
    "events_funnel",
    "orders_retention_cohort",
    "minhash_lsh_pairs_incremental",
    "embedding_lsh_neardup_pairs_incremental",
    "doc_duplicate_spans",
    "doc_scrub_duplicate_spans",
    "corpus_mix_weights",
    "doc_pack_sequences",
    "events_hopping_window",
    "doc_unigram_logppl",
    "doc_chunk_overlap",
    "doc_heavy_tokens_topk",
    "embedding_pca_project",
    "events_session_window",
    "corpus_mix_sample",
    "embedding_knn_join",
    "audio_frame_features",
]

# sized so politeness capacity (hosts x avg per-host budget, x4 budget
# scale) lets each wave actually reach batch_size; wave fixed-cost then
# amortizes the way it would at cluster scale (10^7-row waves)
CRAWL_IMAGES, CRAWL_URLS, CRAWL_HOSTS = 2000, 200_000, 5000
CRAWL_BATCH, CRAWL_WAVES, CRAWL_BUDGET_SCALE = 30_000, 6, 4


def _crawl_bench(spark, cpus: int) -> dict:
    import shutil
    import tempfile

    from visiblev8_crawler_spark.sources import synth
    from visiblev8_crawler_spark.streaming import scheduler

    from pyspark.sql import functions as F

    world = f"/tmp/vv8_bench_world_{CRAWL_IMAGES}_{CRAWL_URLS}_{CRAWL_HOSTS}_b{CRAWL_BUDGET_SCALE}"
    if not os.path.exists(os.path.join(world, "images.parquet")):
        os.makedirs(world, exist_ok=True)
        synth.generate_images_spark(spark, CRAWL_IMAGES, cpus * 2).write.mode(
            "overwrite"
        ).parquet(os.path.join(world, "images.parquet"))
        synth.generate_frontier_spark(
            spark, CRAWL_URLS, CRAWL_IMAGES, CRAWL_HOSTS, cpus * 2
        ).write.mode("overwrite").parquet(os.path.join(world, "frontier.parquet"))
        spark.createDataFrame(
            synth.generate_robots_pdf(CRAWL_HOSTS, CRAWL_BUDGET_SCALE)
        ).write.mode("overwrite").parquet(os.path.join(world, "robots.parquet"))

    cat_dir = tempfile.mkdtemp(prefix="vv8_bench_cat_")
    try:
        t0 = time.perf_counter()
        cat = scheduler.run_campaign(
            spark,
            cat_dir,
            spark.read.parquet(os.path.join(world, "frontier.parquet")),
            spark.read.parquet(os.path.join(world, "robots.parquet")),
            spark.read.parquet(os.path.join(world, "images.parquet")),
            # wave_period_s: a 30k-row wave models ~20 min of politeness
            # clock (the 10^10-campaign shape this bench reproduces), so the
            # crawl-delay rate cap floor(period/delay) >= the scaled
            # max_per_wave and throughput, not politeness, is what's measured
            # (politeness-rate semantics are pinned by test_crawl_delay_budget)
            scheduler.CrawlConfig(
                batch_size=CRAWL_BATCH, default_budget=100, wave_period_s=1200.0
            ),
            stop_after_waves=CRAWL_WAVES,
        )
        wall = time.perf_counter() - t0
        m = cat.read("metrics").agg(
            F.sum("n_attempted").alias("n"), F.sum("wall_s").alias("w")
        ).collect()[0]
        attempted, wave_wall = int(m["n"] or 0), float(m["w"] or 0.0)
        return {
            "crawl_attempted": attempted,
            "crawl_wall_s": round(wall, 3),
            "crawl_rows_per_s": round(attempted / wall, 1) if wall > 0 else 0.0,
            # per-wave walls only (prep/derive/warmup amortize over a real
            # campaign's thousands of waves)
            "crawl_steady_rows_per_s": round(attempted / wave_wall, 1) if wave_wall > 0 else 0.0,
        }
    finally:
        shutil.rmtree(cat_dir, ignore_errors=True)


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


def main() -> None:
    loadavg_start = _loadavg()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("vv8-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = em.queries()
    spark.range(1000).count()  # JVM warmup
    # warm the scan path too (parquet footers, codegen, broadcast machinery):
    # round 1 charged ~2.5 s of one-time JVM warmup to whichever query ran
    # first (star_join_revenue: 3.2 s cold, 1.0 s warm at sf0.1), which
    # mismeasures the query. One trivial count per input table moves that
    # one-time cost out of the timed loop; noted in BASELINE.md so rounds
    # compare apples to apples.
    for t in ("orders", "lineitem", "customer", "nation", "region",
              "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    import statistics

    RUNS = 3

    def timed(fn) -> tuple[float, float]:
        """(median, min) of RUNS back-to-back executions."""
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 3), round(min(ts), 3)

    per_query: dict[str, float] = {}
    per_query_min: dict[str, float] = {}
    for name in HEADLINE:
        per_query[name], per_query_min[name] = timed(
            lambda: qs[name](spark, sf_dir).collect()
        )

    # round-2 operators, timed OUTSIDE the headline so headline_suite_sec
    # stays directly comparable across rounds
    extra: dict[str, float] = {}
    extra_min: dict[str, float] = {}
    for name in EXTRA:
        extra[name], extra_min[name] = timed(lambda: qs[name](spark, sf_dir).collect())

    crawl = _crawl_bench(spark, cpus)
    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "queries_min": per_query_min,
                "runs": RUNS,
                "extra_queries": extra,
                "extra_queries_min": extra_min,
                "extra_sec": round(sum(extra.values()), 3),
                "min_sec": round(sum(per_query_min.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **crawl,
                "loadavg_start": loadavg_start,
                "loadavg_end": _loadavg(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
