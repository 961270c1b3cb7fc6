"""The campaign scheduler: micro-batch crawl waves over the pending frontier.

This is the Spark-native replacement for the reference's whole control plane —
url_sender.py's batch loop (BATCH_SIZE waves, url_sender.py:47-49, 228-287),
the Celery/Redis queues (vv8_worker/app.py:30-41), per-URL progress pickle
checkpointing (url_sender.py:146-200), and retry-once (url_sender.py:242-253)
— collapsed into one deterministic DataFrame loop with atomic per-wave
commits (catalog.ParquetCatalog; Iceberg semantics).

State model (append-only, Iceberg-shaped):
    frontier_prepared  immutable, written once at prep (+ appended by
                       add_seeds): every seed dispositioned; reason null =
                       the schedulable pool.
    fetches            appended per wave; the ONLY mutable crawl state.
                       Everything else is a projection of it:
                         url_seen  = first attempts (url_seen_df)
                         retries   = failed-retryable firsts minus already-
                                     retried (pending_df)
                         lineage   = per-(wave, partition) rollup (lineage_df)
    pending            DERIVED, never written: pool ANTI url_seen ∪ retries.
                       During a run it lives as a localCheckpoint'd DataFrame
                       updated per wave with a broadcast anti-join (selected
                       wave ids are <= batch_size rows); on resume it is
                       re-derived from the committed tables. At 10^10-frontier
                       scale this is the difference between appending
                       ~batch_size rows per wave and rewriting the whole
                       frontier per wave.

Per wave:
    pending ->(select_wave: politeness windows + top-k)-> wave rows
            ->(fetch_verify: semi-join-pruned images join + Arrow UDF)-> rows
    commit atomically: append fetches + metrics, watermark = wave_id.

Exactly-once resume: every wave is a pure function of the previous committed
snapshot, and the manifest swap is atomic — kill the driver anywhere and a
restart re-runs at most the in-flight wave, producing byte-identical tables
(C8, url_sender.py:146-200 semantics, minus the pickle). localCheckpoint is
a pure cache: if its blocks are lost (executor death on a real cluster) the
campaign restarts from the catalog and re-derives, so reliability never
depends on it.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..catalog import ParquetCatalog
from ..operators.dedup import prepare_frontier
from ..operators.fetch import fetch_verify
from ..operators.waves import (
    DEFAULT_CRAWL_DELAY_S,
    DEMOTE_AFTER_FAILURES,
    DEMOTE_FACTOR,
    choose_salt_width,
    next_eligible_wave,
    robots_dim,
    salt_col,
    select_wave,
)
from ..simulator import RETRYABLE

TABLE_SCHEMAS = {
    "frontier_prepared": schemas.FRONTIER_PREPARED,
    "fetches": schemas.FETCHES,
    "rejected": schemas.REJECTED,
    "metrics": schemas.METRICS,
    "bloom": schemas.BLOOM_STATE,
    # cluster-path politeness state (_TableHostState): per-wave deltas
    # appended atomically WITH each wave's commit (latest-per-host resolved
    # by host_state_view; periodically folded), so it can never be stale
    # relative to the fetch ledger it summarizes. Absent in dict-mode
    # campaigns.
    "host_state": schemas.HOST_STATE,
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


def pool_df(cat: ParquetCatalog) -> DataFrame:
    """The schedulable pool: prepared rows that passed validate/dedup/robots."""
    return cat.read("frontier_prepared").filter(F.col("reason").isNull())


def pending_df(cat: ParquetCatalog, salt_width: int = 8) -> DataFrame:
    """Re-derive not-yet-crawled state from the committed tables (the resume
    path, and the definition the in-run incremental pending must equal):
      fresh   = pool ANTI url_seen                       (attempt 1)
      retries = failed-retryable first attempts that have no second attempt
                yet, rejoined to their pool row          (attempt 2)
    """
    pool = pool_df(cat).withColumn("salt", salt_col(F.col("canon_url"), salt_width))
    fetches = cat.read("fetches")
    first = fetches.filter(F.col("attempt") == 1)
    fresh = pool.join(first.select("canon_url"), "canon_url", "left_anti").withColumn(
        "attempt", F.lit(1)
    )
    retry_urls = (
        first.filter(F.col("status").isin(*RETRYABLE))
        .select("canon_url")
        .join(
            fetches.filter(F.col("attempt") == 2).select("canon_url"),
            "canon_url",
            "left_anti",
        )
    )
    # retry-without-actions (reference parity: the retry crawls the direct
    # URL with actions reset to None, vv8_worker/tasks.py:149-158)
    retries = (
        pool.join(retry_urls, "canon_url", "left_semi")
        .withColumn("attempt", F.lit(2))
        .withColumn("actions", F.lit(None).cast("string"))
    )
    return schemas.conform(fresh.unionByName(retries), schemas.PENDING)


def host_state_df(
    cat: ParquetCatalog,
    robots: DataFrame,
    default_budget: int = 25,
    wave_period_s: float = 60.0,
    demote_after_failures: int = DEMOTE_AFTER_FAILURES,
    demote_factor: int = DEMOTE_FACTOR,
) -> DataFrame:
    """Re-derive the per-host politeness token bucket + abuse record from the
    committed fetch ledger (the resume path; same design rule as pending_df:
    host state is a PROJECTION of fetches, never a second sink — no per-wave
    state table to write, compact, or reconcile).

    The bucket recurrence (waves.politeness_exprs) is a sequential fold per
    host over its (wave_id, n_selected, n_ok) history, so the replay is a
    grouped applyInPandas: one shuffle by host at resume time, with the
    identical IEEE-double arithmetic the in-run incremental update performs —
    the kill-resume equality test is what proves the two never diverge."""
    import pandas as pd

    per_wave = (
        cat.read("fetches")
        .groupBy("host", "wave_id")
        .agg(
            F.count("*").alias("n_sel"),
            F.sum(F.when(F.col("status") == "OK", 1).otherwise(0)).alias("n_ok"),
        )
    )
    dims = robots.select(
        "host",
        "max_per_wave",
        *(
            [F.col("crawl_delay_s")]
            if "crawl_delay_s" in robots.columns
            else [F.lit(None).cast("double").alias("crawl_delay_s")]
        ),
    )
    joined = per_wave.join(F.broadcast(dims), "host", "left")
    wp, db = float(wave_period_s), int(default_budget)
    da, dfac = int(demote_after_failures), int(demote_factor)

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("wave_id")
        m_raw = pdf["max_per_wave"].iloc[0]
        m = db if pd.isna(m_raw) else int(m_raw)
        d_raw = pdf["crawl_delay_s"].iloc[0]
        d = DEFAULT_CRAWL_DELAY_S if (pd.isna(d_raw) or d_raw <= 0) else float(d_raw)
        rate = wp / d
        credit, last, ok, failed = 0.0, -1, 0, 0
        for w, n_sel, n_ok in zip(pdf["wave_id"], pdf["n_sel"], pdf["n_ok"]):
            m_eff = max(1, m // dfac) if (failed >= da and failed > ok) else m
            eff = min(credit + rate * (int(w) - last), float(max(m_eff, 1)))
            credit = eff - int(n_sel)
            last = int(w)
            ok += int(n_ok)
            failed += int(n_sel) - int(n_ok)
        return pd.DataFrame(
            [
                {
                    "host": pdf["host"].iloc[0],
                    "credit": credit,
                    "last_wave": last,
                    "ok": ok,
                    "failed": failed,
                }
            ]
        )

    return joined.groupBy("host").applyInPandas(fold, schema=schemas.HOST_STATE)


class _HostState:
    """In-run politeness state: {host: [credit, last_wave, ok, failed]}.

    Driver-held, like the bloom shards (the north_rule's own "broadcast
    bloom" pattern): per-host aggregate state is orders of magnitude
    smaller than the frontier (~50 B/host), and the selection plan consumes
    it as a broadcast dimension either way — holding the authoritative copy
    on the driver removes one checkpoint action + one aggregation job per
    wave (measured 0.4 s/wave at local[8], the entire politeness overhead).
    Past broadcast range (cfg.host_state_broadcast_max hosts) the
    scheduler switches to _TableHostState — the state lives as a catalog
    table merged atomically per wave; the update arithmetic below is the
    exact Python mirror of waves.politeness_exprs /
    simulator.simulate_campaign, so all implementations stay in
    IEEE-double lockstep (dict-vs-table equivalence is tested
    bit-identical). Resume re-derives the dict by folding the fetch
    ledger (host_state_df) — state is still a projection of fetches."""

    broadcast = True  # selection consumes as_df() as a broadcast dimension

    def __init__(self, rows, robots_rows, cfg: "CrawlConfig"):
        self.state = {
            r["host"]: [r["credit"], r["last_wave"], r["ok"], r["failed"]]
            for r in rows
        }
        # robots_rows come from robots_dim(), which always carries both cols
        self.dims = {
            r["host"]: (r["max_per_wave"], r["crawl_delay_s"]) for r in robots_rows
        }
        self.cfg = cfg

    def as_df(self, spark: SparkSession) -> DataFrame | None:
        """The selection-side dimension frame: a LocalRelation built via
        Arrow — scanned inside the select job, no extra Spark action.

        Only hosts whose budget actually DEPENDS on carried state ride
        along — an exact filter, not an approximation: for a host with
        refill rate >= bucket cap (delay small relative to the wave
        period, the common case) and no demotion, eff = min(credit +
        rate*delta, cap) = cap for every delta >= 1 and any credit >= 0,
        so its budget equals the stateless default and the politeness
        expressions compute the identical value from the null-state
        branch. Campaigns with no delay-bound or demoted hosts (e.g. the
        throughput bench at wave_period=1200) therefore skip the state
        broadcast entirely (measured ~10% of wave wall at 5000 hosts)."""
        rows = [
            (h, v[0], v[1], v[2], v[3])
            for h, v in self.state.items()
            if self._state_relevant(h, v)
        ]
        if not rows:
            return None
        import pandas as pd

        pdf = pd.DataFrame(
            rows, columns=["host", "credit", "last_wave", "ok", "failed"]
        )
        return spark.createDataFrame(pdf, schema=schemas.HOST_STATE)

    def _state_relevant(self, host: str, v) -> bool:
        _credit, _last, ok, failed = v
        if failed >= self.cfg.demote_after_failures and failed > ok:
            return True  # demoted: budget differs from the robots default
        rate, m = self._rate_m(host)
        return rate < float(max(m, 1))  # delay-bound: credit carries

    def _rate_m(self, host: str) -> tuple[float, int]:
        m, d = self.dims.get(host, (None, None))
        if m is None:
            m = self.cfg.default_budget
        if not d or d <= 0:
            d = DEFAULT_CRAWL_DELAY_S
        return self.cfg.wave_period_s / d, m

    def update(self, wave_id: int, host_stats) -> None:
        """Fold one wave's per-host (n_sel, n_ok) aggregate rows — produced
        by a 2-column scan of the just-committed wave parquet that runs on
        a background thread OVERLAPPED with the pending-update checkpoint,
        so the stats cost ~zero wall time (an Observation collect_list on
        the write measured ~0.3 s/wave at 22k rows; the overlapped scan
        hides entirely behind the ~1 s checkpoint)."""
        for r in host_stats:
            host, n_sel, n_ok = r["host"], int(r["n_sel"]), int(r["n_ok"])
            credit, last, ok, failed = self.state.get(host, (0.0, -1, 0, 0))
            rate, m = self._rate_m(host)
            m_eff = (
                max(1, m // self.cfg.demote_factor)
                if (failed >= self.cfg.demote_after_failures and failed > ok)
                else m
            )
            eff = min(credit + rate * (wave_id - last), float(max(m_eff, 1)))
            self.state[host] = [
                eff - n_sel, wave_id, ok + n_ok, failed + (n_sel - n_ok)
            ]


def host_state_view(cat: ParquetCatalog) -> DataFrame:
    """Latest-per-host politeness state over the append-delta ``host_state``
    table (merge-on-read): each wave appends rows only for the hosts it
    touched, stamped with that wave id in ``last_wave``, so the current
    state is max_by(last_wave) per host. Ties are impossible — a host gains
    at most one row per wave, and a killed wave's unpublished set is
    overwritten, never double-published."""
    cols = [f.name for f in schemas.HOST_STATE.fields if f.name != "host"]
    return (
        cat.read("host_state")
        .groupBy("host")
        .agg(F.max_by(F.struct(*cols), F.col("last_wave")).alias("s"))
        .select("host", "s.*")
    )


class _TableHostState:
    """Cluster-path politeness state: the ``host_state`` catalog table,
    updated by APPENDING a per-wave delta (touched hosts only) in the SAME
    atomic commit as the wave it reflects — the Iceberg
    MERGE-with-merge-on-read analog. This is the overflow path the
    _HostState docstring promises: past broadcast range
    (cfg.host_state_broadcast_max hosts) the per-host state neither lives
    on the driver nor rides a broadcast — selection joins it shuffle-side
    (state_broadcast=False; bucketed-by-host Iceberg layout makes that
    storage-partitioned) — and the per-wave WRITE is O(hosts touched this
    wave), never O(all hosts) (the round-4 first cut rewrote the whole
    table per wave; at 10^8 hosts that rewrite would have been the new
    per-wave bottleneck). Reads resolve latest-per-host via
    host_state_view; the maintenance pass periodically folds the deltas
    back to one row per host (fold_committed) so read cost stays bounded.
    The update arithmetic is the SAME politeness_exprs the selection and
    the dict path use, so all paths stay in IEEE-double lockstep (the
    dict-vs-table equivalence test asserts bit-identical selection AND
    final state).

    Update recurrence per touched host (identical to _HostState.update):
        eff        = min(credit + rate*(wave - last_wave), cap)   # exprs
        credit'    = eff - n_sel
        last_wave' = wave
        ok'        = ok + n_ok;  failed' = failed + (n_sel - n_ok)
    Untouched hosts simply keep their previous row live (no rewrite).
    Hosts first seen this wave enter through the exprs' null defaults
    (credit 0, last_wave -1) — exactly _HostState's .get default.

    Crash safety: the delta is written inside the wave's atomic commit
    (multi-table manifest swap), so a kill anywhere leaves state and
    ledger at the same watermark; resume reads the committed table, or
    falls back to the host_state_df ledger fold when the catalog has none
    (e.g. a campaign started in dict mode) — the fold and the table view
    are equal by construction.

    Unlike the dict path, as_df applies NO relevance filter: the filter
    only shrinks a broadcast, and here the join shuffles either way; the
    full table yields identical budgets (the filter is provably exact)."""

    broadcast = False  # selection must not force-broadcast this dimension

    def __init__(self, cat: ParquetCatalog, robots: DataFrame, cfg: "CrawlConfig"):
        self.cat = cat
        self.robots = robots
        self.cfg = cfg
        self._bootstrap: DataFrame | None = None

    def seed_from_fold(self, df: DataFrame) -> None:
        """Adopt a ledger fold (host_state_df) as the pre-first-commit
        state — used when the catalog has no host_state table yet. The
        first wave's delta() carries it into the table as the base
        generation."""
        self._bootstrap = df.localCheckpoint(eager=True)

    def _current(self) -> DataFrame:
        if self._bootstrap is not None:
            return self._bootstrap
        return host_state_view(self.cat)

    def as_df(self, spark: SparkSession) -> DataFrame:
        return self._current()

    def delta(self, spark: SparkSession, wave_id: int, fetches_path: str) -> DataFrame:
        """This wave's state delta (lazy) — handed to the wave's commit as
        ``appends={"host_state": ...}``. Rows for touched hosts only (plus,
        on the very first table-mode commit, the bootstrap base — its rows
        carry older last_wave stamps, so latest-wins resolves overlaps).
        Reads only immutable inputs: the just-written (still unpublished)
        wave parquet and the previous committed state."""
        from ..operators.waves import join_politeness_dims, politeness_exprs

        cfg = self.cfg
        stats = (
            spark.read.schema(schemas.FETCHES)
            .parquet(fetches_path)
            .groupBy("host")
            .agg(
                F.count("*").alias("n_sel"),
                F.sum(F.when(F.col("status") == "OK", 1).otherwise(0)).alias("n_ok"),
            )
        )
        old = self._current()
        e = politeness_exprs(
            wave_id, cfg.default_budget, cfg.wave_period_s,
            cfg.demote_after_failures, cfg.demote_factor,
        )
        touched = join_politeness_dims(stats, self.robots, old, state_broadcast=False)
        new_touched = touched.select(
            "host",
            (e["eff_credit"] - F.col("n_sel")).alias("credit"),
            F.lit(wave_id).alias("last_wave"),
            (F.coalesce(F.col("ok"), F.lit(0)) + F.col("n_ok")).alias("ok"),
            (
                F.coalesce(F.col("failed"), F.lit(0))
                + (F.col("n_sel") - F.col("n_ok"))
            ).alias("failed"),
        )
        if self._bootstrap is not None:
            base = self._bootstrap.join(stats.select("host"), "host", "left_anti")
            new_touched = base.unionByName(new_touched)
        return schemas.conform(new_touched, schemas.HOST_STATE)

    def on_committed(self) -> None:
        """The wave commit published the delta; drop any bootstrap so reads
        go to the catalog from now on."""
        self._bootstrap = None

    def fold_committed(self, min_file_sets: int = 2) -> bool:
        """Fold accumulated deltas back to one row per host (the Iceberg
        compaction of a merge-on-read table): replaces the table with
        host_state_view's resolution. Same locking discipline as
        catalog.compact — snapshot and commit under the writer lock, with
        the expect_replaced guard as the structural backstop."""
        from visiblev8_crawler_spark.catalog import ConcurrentReplaceError

        cat = self.cat
        with cat.writer_lock():
            # bounded retry on ConcurrentReplaceError (same recovery as
            # catalog.compact): a lock-free appender landing between the
            # snapshot and the manifest swap aborts the rewrite; re-snapshot
            # picks up its rows and tries again
            for attempt in range(4):
                expected = cat._load_manifest()["tables"].get("host_state", [])
                if len(expected) < min_file_sets:
                    return False
                snap = cat.spark.read.schema(schemas.HOST_STATE).parquet(*expected)
                cols = [f.name for f in schemas.HOST_STATE.fields if f.name != "host"]
                folded = (
                    snap.groupBy("host")
                    .agg(F.max_by(F.struct(*cols), F.col("last_wave")).alias("s"))
                    .select("host", "s.*")
                )
                try:
                    cat.commit(
                        None,
                        replaces={"host_state": schemas.conform(folded, schemas.HOST_STATE)},
                        expect_replaced={"host_state": expected},
                    )
                    return True
                except ConcurrentReplaceError:
                    if attempt == 3:
                        raise
        return True


@dataclass
class CrawlConfig:
    batch_size: int = 1000
    default_budget: int = 25
    # one wave models this many seconds of wall clock for politeness: a host
    # with robots Crawl-delay d earns period/d bucket credits per wave,
    # carried across waves (waves.politeness_exprs; reference DELAY,
    # url_sender.py:45) — so d > period means one fetch every
    # ceil(d/period) waves, never starvation
    wave_period_s: float = 60.0
    # abuse demotion (SURVEY §4.2.3): a host with >= demote_after_failures
    # failed fetches AND more failures than successes has its concurrency
    # cap cut to max(1, max_per_wave // demote_factor) until it recovers
    demote_after_failures: int = DEMOTE_AFTER_FAILURES
    demote_factor: int = DEMOTE_FACTOR
    # None -> choose from the pool's host histogram (waves.choose_salt_width)
    salt_width: int | None = 8
    max_waves: int = 10_000
    # Arrow rows per batch for the fetch stage. Wave rows carry the full
    # image ``bytes`` column, so the Spark default (10_000 rows/batch) builds
    # multi-GB Arrow batches that stall the JVM->Python pipeline and churn
    # both heaps; 64 rows keeps batches ~16 MB at 250 KB/row and the decode
    # workers saturated (25k-row wave: 60 s -> 24 s at local[32], and larger
    # batches degrade sharply — 256 rows measured 106 s).
    arrow_batch_rows: int = 64
    # per-fetch decode budget in ms (reference hard timeout, vv8_worker/
    # tasks.py:131-141); None = no budget. TIMEOUT rows are retryable.
    fetch_timeout_ms: float | None = None
    # fold the fetches table's accumulated per-wave file sets into one every
    # N waves (Iceberg rewrite_data_files analog): a 10^10 campaign appends
    # one set per wave, and reads degrade linearly in set count without it.
    # 0 disables. Runs AFTER the wave commit, as its own atomic commit, so a
    # kill between them loses nothing.
    compact_every: int = 64
    # politeness-state storage: "dict" = driver-held + broadcast dimension
    # (measured ~zero wall cost; right up to millions of hosts at ~50
    # B/host), "table" = host_state catalog table merged atomically per
    # wave with shuffle-side selection join (_TableHostState; the 10^8-host
    # path), "auto" = table iff the pool's distinct host count exceeds
    # host_state_broadcast_max. Both paths produce bit-identical selection
    # and state (equivalence-tested).
    host_state_mode: str = "auto"
    host_state_broadcast_max: int = 1_000_000
    # table mode: fold the per-wave state deltas to one row per host every
    # N waves. The merge-on-read view scans one delta set per wave since
    # the last fold, so this bounds the view's file fan-in (and the
    # latest-per-host dedup) at N sets — a tighter cadence than table
    # compaction because EVERY selection pays the view cost.
    host_state_fold_every: int = 16
    # snapshot retention: every commit keeps its manifest for read_at()
    # time travel; the compaction pass expires all but the newest N and
    # deletes data files referenced only by expired snapshots (Iceberg
    # expire_snapshots analog) — without it every compaction strands the
    # superseded file sets on disk forever. None disables expiry.
    expire_keep_snapshots: int | None = 256
    # reader-lease age floor passed to expire_snapshots: snapshots younger
    # than this are never expired, so an incremental consumer (catalog.poll
    # / jobs/poll_fetches.py) that re-polls at least this often can never
    # have a lazy delta scan's files deleted from under it by the wave
    # loop's maintenance pass. 0 disables the floor (tests that assert
    # tight disk bounds set it explicitly).
    expire_min_age_s: float = 300.0


def open_catalog(spark: SparkSession, root: str) -> ParquetCatalog:
    return ParquetCatalog(spark, root, TABLE_SCHEMAS)


def _warm_python_workers(spark: SparkSession) -> None:
    """Spawn + warm one Python worker per core before the first wave (imports
    of numpy/pandas/the verify kernel happen here, not inside wave 0). The
    cluster analog is executor/container warmup; without it the first wave's
    fetch pays ~N_cores × interpreter-start + import latency."""
    n = spark.sparkContext.defaultParallelism

    def _w(batches):
        import time as _t

        from visiblev8_crawler_spark import verify  # noqa: F401 (import cost)

        _t.sleep(0.25)  # hold the slot so every core spawns its own worker
        yield from batches

    spark.range(n, numPartitions=n).mapInPandas(_w, "id long").count()


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
        # the expensive pass (canonicalize + dedup window + robots gate)
        # computed ONCE; rejected is then derived by scanning the just-
        # written files — no recompute. Both sets are written UNPUBLISHED
        # and land in ONE atomic commit: a kill at any earlier point leaves
        # only unpublished junk that the re-run overwrites (paths are
        # deterministic), never a published path to collide with.
        fp_path = cat.write_unpublished(
            "frontier_prepared", prepare_frontier(frontier, robots), "prep"
        )
        fp = spark.read.schema(schemas.FRONTIER_PREPARED).parquet(fp_path)
        rej_path = cat.write_unpublished(
            "rejected",
            schemas.conform(fp.filter(F.col("reason").isNotNull()), schemas.REJECTED),
            "prep",
        )
        cat.commit(
            "prep",
            prewritten={"frontier_prepared": fp_path, "rejected": rej_path},
            prepared=True,
        )

    arrow_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev_arrow = spark.conf.get(arrow_key, None)
    spark.conf.set(arrow_key, str(cfg.arrow_batch_rows))

    # derive once (resume point), then maintain incrementally in memory;
    # localCheckpoint materializes each generation and truncates lineage so
    # plan depth stays O(1) in waves (a persist-chain would preserve
    # outputPartitioning but accumulates nested cached plans until the JVM
    # heap gives out). The phase-1 politeness window therefore pays one
    # hash exchange of the fresh pool per wave in local mode; on a real
    # cluster the pool lives as an Iceberg table bucketed by (host, salt)
    # and storage-partitioned reads make that exchange disappear. Retries
    # (tiny, bounded by one wave's failures) are unioned into this pending
    # frame at commit time (_wave_loop) and ride the same selection path.
    P = spark.sparkContext.defaultParallelism
    _warm_python_workers(spark)
    salt_width = (
        cfg.salt_width if cfg.salt_width is not None else choose_salt_width(pool_df(cat))
    )
    pending = pending_df(cat, salt_width).localCheckpoint(eager=True)
    # politeness state resumes from the ledger too (empty ledger -> empty
    # state): the distributed fold replays exactly what the in-run updates
    # computed. Storage mode: driver dict + broadcast below the host-count
    # threshold (the fold's per-host aggregate comes to the driver,
    # bloom-shard pattern; see _HostState), catalog table merged per wave
    # above it (_TableHostState).
    mode = cfg.host_state_mode
    if mode == "auto":
        # mode pinning, as a ONE-WAY dict->table ratchet:
        # approx_count_distinct's ±2-4% error around a pool sitting exactly
        # at the threshold picks a mode nondeterministically across runs —
        # harmless within one campaign (both modes are equivalence-tested)
        # but a resume must never flip table->dict (losing the committed
        # state table's authority) or oscillate at the boundary. A pinned
        # "table" is final; a pinned "dict" still re-runs the census so a
        # pool that GREW past broadcast range (add_seeds ingest) upgrades
        # instead of driving a full-host-universe collect on the driver —
        # the table bootstrap path (seed_from_fold below) makes the upgrade
        # exact.
        pinned = cat.meta("host_state_mode")
        if pinned == "table":
            mode = "table"
        else:
            # approx census: the threshold decision tolerates sketch error,
            # and an exact distinct over a 10^10-row pool would shuffle
            # every host string just to pick a storage mode
            n_hosts = pool_df(cat).agg(
                F.approx_count_distinct("host").alias("n")
            ).collect()[0]["n"]
            mode = "table" if n_hosts > cfg.host_state_broadcast_max else "dict"
            if pinned == "dict" and mode == "dict":
                pass  # unchanged; no re-pin commit needed
            else:
                cat.commit(None, meta={"host_state_mode": mode})
    elif mode in ("dict", "table") and cat.meta("host_state_mode") != mode:
        # an explicit flag overrides (both modes are equivalent); re-pin so
        # a later auto resume stays on what actually ran last
        cat.commit(None, meta={"host_state_mode": mode})
    if mode == "table":
        hstate: _HostState | _TableHostState = _TableHostState(cat, robots, cfg)
        if cat.file_sets("host_state") == 0:
            # no committed state (fresh campaign, or one started in dict
            # mode): bootstrap from the ledger fold — equal to what the
            # table would contain, by the three-way lockstep arithmetic
            hstate.seed_from_fold(
                host_state_df(
                    cat, robots, cfg.default_budget, cfg.wave_period_s,
                    cfg.demote_after_failures, cfg.demote_factor,
                )
            )
    elif mode == "dict":
        hstate = _HostState(
            host_state_df(
                cat, robots, cfg.default_budget, cfg.wave_period_s,
                cfg.demote_after_failures, cfg.demote_factor,
            ).collect(),
            robots_dim(robots).collect(),
            cfg,
        )
    else:
        raise ValueError(f"unknown host_state_mode {cfg.host_state_mode!r}")

    wave_id = cat.watermark() + 1
    try:
        _wave_loop(
            spark, cat, robots, images, cfg, stop_after_waves, pending, wave_id,
            salt_width, hstate,
        )
    finally:
        if prev_arrow is None:
            spark.conf.unset(arrow_key)
        else:
            spark.conf.set(arrow_key, prev_arrow)
    return cat


def _wave_loop(
    spark, cat, robots, images, cfg, stop_after_waves, pending, wave_id, salt_width,
    hstate,
):
    P = spark.sparkContext.defaultParallelism
    waves_done = 0
    carry_s = 0.0  # previous wave's commit+update time, folded into this wall
    while wave_id < cfg.max_waves:
        if stop_after_waves is not None and waves_done >= stop_after_waves:
            break
        t0 = time.perf_counter()
        state_df = hstate.as_df(spark)
        state_broadcast = getattr(hstate, "broadcast", True)
        # select_wave necessarily funnels through one partition to assign
        # order_in_wave (bounded <= batch_size rows); re-spread the wave so
        # the fetch UDF uses every core instead of one.
        selected = (
            select_wave(
                pending, robots, wave_id, cfg.batch_size, cfg.default_budget,
                salt_width, wave_period_s=cfg.wave_period_s,
                host_state=state_df,
                demote_after_failures=cfg.demote_after_failures,
                demote_factor=cfg.demote_factor,
                state_broadcast=state_broadcast,
            )
            .repartition(P, "canon_url")
            .persist()
        )
        # the fetches write is the wave's ONLY pass over the fetch results:
        # counts ride along as Observation metrics (no separate agg job, no
        # results cache), and the file set stays unpublished until the commit
        # below — so an empty wave, or a crash here, publishes nothing.
        obs = Observation()
        results = fetch_verify(selected, images, cfg.fetch_timeout_ms).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("status") == "OK", 1).otherwise(0)).alias("ok"),
        )
        fetches_path = cat.write_unpublished("fetches", results, f"wave={wave_id}")
        n_attempted = int(obs.get["n"])
        n_ok = int(obs.get["ok"] or 0)
        if n_attempted == 0:
            selected.unpersist()
            # pending drained -> done; pending non-empty means every host's
            # bucket is below 1 credit (Crawl-delay > wave period): jump to
            # the earliest wave where one refills instead of spinning empty
            # selection passes (simulator mirrors the same jump)
            if pending.isEmpty():
                break
            nxt = next_eligible_wave(
                pending, robots, state_df, cfg.default_budget, cfg.wave_period_s,
                state_broadcast,
            )
            if nxt is None:  # no pending host can ever fetch (cap 0)
                break
            wave_id = max(wave_id + 1, nxt)
            continue

        wall = time.perf_counter() - t0 + carry_s
        # JVM-side 1-row relation: a python-list createDataFrame would drag a
        # 32-partition Python RDD through the worker pipeline (~5 s/write)
        metrics = schemas.conform(
            spark.range(0, 1, 1, 1)
            .select(
                F.lit(wave_id).alias("wave_id"),
                F.lit(n_attempted).alias("n_attempted"),
                F.lit(n_ok).alias("n_ok"),
                F.lit(n_attempted - n_ok).alias("n_failed"),
                F.lit(wall).alias("wall_s"),
                F.lit(n_attempted / wall if wall > 0 else 0.0).alias("rows_per_s"),
            ),
            schemas.METRICS,
        )

        # the atomic wave commit: appends only — nothing is rewritten. In
        # table mode the politeness-state DELTA (touched hosts only) rides
        # the SAME manifest swap (multi-table commit), so ledger and state
        # can never disagree at a resume point; the delta plan reads only
        # immutable inputs (the unpublished wave parquet + the previous
        # committed state), so writing it inside the commit critical
        # section is safe, and its cost is O(hosts touched this wave).
        t_commit = time.perf_counter()
        table_mode = isinstance(hstate, _TableHostState)
        appends = {"metrics": metrics}
        if table_mode:
            appends["host_state"] = hstate.delta(spark, wave_id, fetches_path)
        cat.commit(
            f"wave={wave_id}",
            appends=appends,
            prewritten={"fetches": fetches_path},
            watermark=wave_id,
        )
        if table_mode:
            hstate.on_committed()

        # dict mode only: per-host outcome aggregate for the politeness
        # state — a 2-column columnar scan of the just-committed wave
        # parquet, submitted on a background thread so it runs CONCURRENTLY
        # with the pending-update checkpoint below and costs ~zero wall
        # time (both read immutable committed data; Spark schedules jobs
        # from separate threads fine)
        import threading

        stats_box: dict = {}
        stats_thread = None
        if not table_mode:

            def _collect_stats(path=fetches_path, box=stats_box):
                try:
                    box["rows"] = (
                        spark.read.schema(schemas.FETCHES)
                        .parquet(path)
                        .groupBy("host")
                        .agg(
                            F.count("*").alias("n_sel"),
                            F.sum(
                                F.when(F.col("status") == "OK", 1).otherwise(0)
                            ).alias("n_ok"),
                        )
                        .collect()
                    )
                except BaseException as e:  # surfaced at join below
                    box["err"] = e

            stats_thread = threading.Thread(target=_collect_stats, daemon=True)
            stats_thread.start()

        # incremental pending update (in-memory mirror of pending_df over the
        # new snapshot): drop this wave's rows, add this wave's retryable
        # failures back as attempt 2. Both joins broadcast the wave keys
        # (<= batch_size rows); one localCheckpoint per wave materializes the
        # new generation and truncates lineage. Retry keys are read back from
        # the just-committed parquet — a columnar scan of <= batch_size rows,
        # not a recompute of the fetch kernel.
        wave_keys = F.broadcast(selected.select("canon_url"))
        bad = (
            spark.read.schema(schemas.FETCHES)
            .parquet(fetches_path)
            .filter((F.col("attempt") == 1) & F.col("status").isin(*RETRYABLE))
            .select("canon_url")
        )
        new_retries = schemas.conform(
            selected.join(F.broadcast(bad), "canon_url", "left_semi")
            .withColumn("attempt", F.lit(2))
            # retry-without-actions (vv8_worker/tasks.py:149-158)
            .withColumn("actions", F.lit(None).cast("string")),
            schemas.PENDING,
        )
        pending = (
            pending.join(wave_keys, "canon_url", "left_anti")
            .unionByName(new_retries)
            .coalesce(P)
            .localCheckpoint(eager=True)
        )
        # politeness bucket + abuse record for the <= hosts-in-wave touched
        # hosts — fed by the overlapped stats scan (dict mode; table mode
        # already merged inside the commit)
        if stats_thread is not None:
            stats_thread.join()
            if "err" in stats_box:
                raise stats_box["err"]
            hstate.update(wave_id, stats_box["rows"])
        selected.unpersist()

        # periodic maintenance: compaction is its own atomic commit after
        # the wave publishes, so it can never mix wave data with rewrite
        # data; its cost is charged to this wave's carry_s like the commit.
        # EVERY append-accumulating table folds, not just fetches (r2
        # VERDICT #4): metrics gains one set per wave, frontier_prepared /
        # rejected one per add_seeds ingest — a long campaign's status and
        # resume reads would otherwise degrade linearly in set count. The
        # min_file_sets guard makes untouched tables a no-op.
        if (
            table_mode
            and cfg.host_state_fold_every
            and (wave_id + 1) % cfg.host_state_fold_every == 0
        ):
            # merge-on-read fold: deltas -> one row per host, so the
            # selection-side view's dedup + file fan-in stay bounded
            hstate.fold_committed(min_file_sets=2)
        if cfg.compact_every and (wave_id + 1) % cfg.compact_every == 0:
            for table in ("fetches", "metrics", "frontier_prepared", "rejected"):
                cat.compact(table, min_file_sets=cfg.compact_every)
            if cfg.expire_keep_snapshots:
                cat.expire_snapshots(
                    keep_last=cfg.expire_keep_snapshots,
                    min_age_s=cfg.expire_min_age_s,
                )

        carry_s = time.perf_counter() - t_commit
        wave_id += 1
        waves_done += 1


def add_seeds(
    spark: SparkSession,
    cat: ParquetCatalog,
    new_frontier: DataFrame,
    robots: DataFrame,
    fpp: float = 0.01,
) -> dict:
    """Serialized entry point for seed ingest: the bloom maintenance inside
    is a read-modify-write spanning the whole call (read shards → OR the
    batch delta → publish), so concurrent ingests take the catalog's writer
    lock and run one at a time — the 'single ingest writer' assumption is
    now enforced, not documented. Wave-loop commits are unaffected (they
    never touch the bloom or this lock). See _add_seeds_impl for the full
    semantics."""
    with cat.writer_lock():
        return _add_seeds_impl(spark, cat, new_frontier, robots, fpp)


def _add_seeds_impl(
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
    ingest batch against the full seen-set reshuffles it each time. Here the
    broadcast Bloom filter (operators/bloom.py) screens the batch first —
    bloom-negative rows (the vast majority of genuinely new URLs) skip the
    join entirely; only bloom-positive rows take the exact join, so exactness
    is preserved while the join's probe side shrinks to (dup_rate + fpp) of
    the batch.

    New rows are re-sequenced after every seq already in the catalog, so one
    global crawl order (seq) stays total and deterministic across ingests.
    Dispositions: fresh rows land in frontier_prepared with reason null
    (-> schedulable); already-crawled urls are rejected as 'cached',
    already-enqueued ones as 'enqueued', plus the usual invalid/duplicate/
    robots from preparation. Returns the per-disposition counts.

    Bloom maintenance is INCREMENTAL: the bitmap shards live in the catalog
    ('bloom' table), each ingest ORs in a delta built over just its own new
    rows (O(batch)), and the updated shards publish in the same atomic
    commit as the frontier append. A full O(pool) rebuild happens only when
    n_added outgrows the sized capacity (doubling ⇒ amortized O(1) per row)
    — never per ingest, which at 10^10 seen URLs is the difference between
    a 12 GB-bitmap pass per batch and a few MB of delta OR.

    The remaining pool-sized work per ingest is the exact-confirm join for
    bloom-POSITIVE rows only (a columnar canon_url scan of the pool as the
    join's build side). At 10^10 that scan prunes via the join's runtime
    filters and, on Iceberg, bucket-pruned storage-partitioned reads; the
    bloom guarantees the fraction of rows that ever reach it is
    (dup_rate + fpp) of the batch.
    """
    from ..operators.bloom import (
        bloom_from_rows,
        bloom_or_delta,
        bloom_to_rows,
        build_bloom,
        with_bloom_maybe,
    )

    base = cat.meta("next_seq")
    if base is None:  # pre-meta catalog: derive once from the pool, column-pruned
        got = cat.read("frontier_prepared").agg(F.max("seq")).collect()[0][0]
        base = int(got) + 1 if got is not None else 0

    prep = prepare_frontier(
        new_frontier.withColumn("seq", F.col("seq") + F.lit(base)), robots
    ).persist()
    batch_rejects = prep.filter(F.col("reason").isNotNull())
    cand = prep.filter(F.col("reason").isNull())

    # the "crawl cache": every url in the pool is either crawled (cached) or
    # awaiting crawl (enqueued); url_seen ⊆ pool so one bloom covers both.
    pool_urls = pool_df(cat).select("canon_url")
    state_rows = cat.read("bloom").collect() if cat.file_sets("bloom") else []
    if state_rows:
        bf, capacity, n_added = bloom_from_rows(state_rows)
        if n_added > capacity:  # outgrown: the amortized doubling rebuild
            n_added = pool_urls.count()
            capacity = max(2 * n_added, 1024)
            bf = build_bloom(pool_urls, "canon_url", capacity=capacity, fpp=fpp)
    else:
        # first ingest on this catalog: one-time build over the pool with 2x
        # headroom so subsequent ingests stay delta-only
        n_added = pool_urls.count()
        capacity = max(2 * n_added, 1024)
        bf = build_bloom(pool_urls, "canon_url", capacity=capacity, fpp=fpp)
    flagged = with_bloom_maybe(cand, bf).persist()
    clean = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = (
        flagged.filter(F.col("maybe_seen"))
        .drop("maybe_seen")
        .join(pool_urls.withColumn("_pool", F.lit(True)), "canon_url", "left")
        .join(
            url_seen_df(cat).select("canon_url").withColumn("_seen", F.lit(True)),
            "canon_url",
            "left",
        )
        .withColumn(
            "reason",
            F.when(F.col("_seen"), "cached").when(F.col("_pool"), "enqueued"),
        )
        .drop("_pool", "_seen")
    )
    ingested = schemas.conform(
        clean.unionByName(suspect), schemas.FRONTIER_PREPARED
    ).persist()

    counts = {
        "added": ingested.filter(F.col("reason").isNull()).count(),
        **{
            r["reason"]: r["n"]
            for r in batch_rejects.unionByName(suspect.filter(F.col("reason").isNotNull()))
            .groupBy("reason")
            .agg(F.count("*").alias("n"))
            .collect()
        },
    }
    # incremental bloom: OR a delta over just this batch's newly-pooled rows
    # (O(batch)); the updated shards and the frontier append publish in ONE
    # atomic commit, so the bloom can never disagree with the pool
    new_pool_urls = ingested.filter(F.col("reason").isNull()).select("canon_url")
    bf = bloom_or_delta(bf, new_pool_urls)
    n_added += counts["added"]
    next_seq = int(
        prep.agg(F.max("seq")).collect()[0][0] or (base - 1)
    ) + 1  # batch-sized agg, not pool-sized

    all_new = schemas.conform(batch_rejects, schemas.FRONTIER_PREPARED).unionByName(ingested)
    # tag=None: derived from the commit counter inside the commit lock, so
    # a concurrent wave-loop commit can never collide with this one. (The
    # bloom read-modify-write above is protected by the writer lock the
    # public add_seeds wrapper holds for the whole ingest.)
    cat.commit(
        None,
        appends={
            "frontier_prepared": all_new,
            "rejected": schemas.conform(
                all_new.filter(F.col("reason").isNotNull()), schemas.REJECTED
            ),
        },
        replaces={
            "bloom": spark.createDataFrame(
                bloom_to_rows(bf, capacity, n_added), schemas.BLOOM_STATE
            )
        },
        meta={"next_seq": next_seq},
    )
    prep.unpersist()
    flagged.unpersist()
    ingested.unpersist()
    return counts


def fetch_status(cat: ParquetCatalog, url: str) -> DataFrame:
    """The §3.2 interactive metadata query (`vv8cli fetch status <url>`,
    scripts/fetch.py:78-112 + backend tasks.py:330-386) as one DataFrame:
    every attempt's verdict for the URL, or its rejection disposition if it
    never scheduled. The reference needed sqlite + HTTP + Postgres + Redis +
    a GridFS glob; here Catalyst plans a filter over two tables."""
    from ..functions.urls import canonicalize

    canon = canonicalize(url)["canon_url"]
    attempts = (
        cat.read("fetches")
        .filter(F.col("canon_url") == canon)
        .select(
            F.lit(canon).alias("canon_url"),
            F.col("attempt"),
            F.col("wave_id"),
            F.col("status"),
            F.col("psnr"),
            F.col("error"),
        )
    )
    rejected = (
        cat.read("rejected")
        .filter(F.col("url") == url)
        .select(
            F.lit(canon).alias("canon_url"),
            F.lit(0).alias("attempt"),
            F.lit(-1).alias("wave_id"),
            F.concat(F.lit("REJECTED:"), F.col("reason")).alias("status"),
            F.lit(0.0).alias("psnr"),
            F.lit(None).cast("string").alias("error"),
        )
    )
    return attempts.unionByName(rejected).orderBy("attempt")


def fetch_artifacts(cat: ParquetCatalog, images: DataFrame, url: str) -> DataFrame:
    """Artifact retrieval (scripts/fetch.py:113-201 analog: download the
    screenshot/HAR/raw-log blobs for a submission): every fetch attempt for
    ``url`` joined back to its artifact bytes + typed metadata. A NOT_FOUND
    attempt comes back with null bytes — the 404 the reference CLI prints.

    Scale shape: the fetches filter is a pushed-down predicate on canon_url,
    and the (tiny) matching ledger rows broadcast against the images table,
    so the blob scan prunes to the matching image_id rows — same join
    strategy as the fetch plane itself (operators/fetch.py)."""
    from ..functions.urls import canonicalize

    canon = canonicalize(url)["canon_url"]
    attempts = cat.read("fetches").filter(F.col("canon_url") == canon).select(
        "canon_url", "image_id", "attempt", "wave_id", "status", "psnr",
        "task_id", "actions", "crawler_args",
    )
    # the preserved side of a left join can't broadcast, so prune the blob
    # table with a broadcast semi-join first, then broadcast the (tiny)
    # pruned rows back — identical strategy to fetch_verify
    ids = attempts.select("image_id").where(F.col("image_id").isNotNull())
    matched = images.join(F.broadcast(ids), "image_id", "left_semi")
    return attempts.alias("a").join(
        F.broadcast(matched.alias("i")), F.col("a.image_id") == F.col("i.image_id"), "left"
    ).select(
        "a.canon_url",
        "a.attempt",
        "a.wave_id",
        "a.status",
        "a.psnr",
        "a.task_id",
        "a.actions",
        "a.crawler_args",
        "a.image_id",
        "i.bytes",
        "i.fmt",
        "i.w",
        "i.h",
        "i.caption",
    ).orderBy("attempt")


def crawl_order_df(cat: ParquetCatalog) -> DataFrame:
    """(canon_url, wave_id, order_in_wave) for first attempts — the golden
    crawl-order tuple compared against the simulator."""
    return (
        cat.read("fetches")
        .filter(F.col("attempt") == 1)
        .select("canon_url", "wave_id", "order_in_wave")
    )
