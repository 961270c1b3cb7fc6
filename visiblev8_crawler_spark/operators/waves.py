"""Wave selection — the politeness-budgeted priority queue, declaratively.

Replaces the reference's Celery/Redis queue + sleeps (url_sender.py:45,
259-261 DELAY; :47-49 BATCH_SIZE waves; eval_banks.py:50-56 priority
preference) with pure window algebra over the ``pending`` DataFrame.

Selection spec (must match simulator.simulate_campaign exactly):
    order key   = (-priority, seq)
    host cap    = robots.max_per_wave (default_budget when host unknown)
    wave        = first ``batch_size`` rows in order whose per-host rank in
                  order is <= the host's cap
which is the window form of the simulator's sequential greedy scan (proof in
simulator.py docstring).

Skew + shuffle design (north_rule "salted, host-hash-partitioned"):
a hot host (Zipf head, urls_100k.txt analog) would put all its pending rows
into one window partition. The ``salt`` column (pmod(xxhash64(canon_url,
'wave-salt'), S), stored in PENDING) splits each host's rows into S
deterministic sub-partitions: phase 1 ranks within (host, salt) and keeps
only rank <= cap — at most S*cap rows per host survive, independent of how
hot the host is — then phase 2 re-ranks exactly within host over that
bounded set. The result is *identical* to the unsalted window for every
S >= 1 (phase 1 can never drop a row that phase 2 would keep: a row with
within-host rank <= cap has within-(host,salt) rank <= cap too).

Phase 1 is the only pending-sized operation: one hash exchange on
(host, salt) + per-partition sort. On a real cluster the pending pool lives
as an Iceberg table bucketed by bucket(host) & salt, and storage-partitioned
reads (spark.sql.sources.v2.bucketing.enabled) eliminate that exchange; in
local mode the pool is a localCheckpoint'd DataFrame and pays it per wave.
Retries are unioned into the pending pool by the scheduler before each wave
(streaming/scheduler._wave_loop), so they flow through the same two-phase
window as fresh rows — one code path, same selection semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 25  # simulator.DEFAULT_MAX_PER_WAVE

# The declarative form of the reference's politeness sleep (url_sender.py:45
# DELAY, :259-261 the 1 s-per-URL throttle): a wave models one scheduling
# period of WAVE_PERIOD_S seconds, so a host whose robots.txt declares
# Crawl-delay: d can receive at most floor(period / d) fetches per wave.
# The effective per-wave budget is min(max_per_wave, floor(period / delay)) —
# max_per_wave stays as the operator-set concurrency cap, crawl_delay_s is
# the site-declared rate the reference honored with sleeps.
DEFAULT_WAVE_PERIOD_S = 60.0
DEFAULT_CRAWL_DELAY_S = 1.0  # reference DELAY=1 s when the site declares none

SALT_SEED = "wave-salt"


def salt_col(canon_url: Column, salt_width: int) -> Column:
    return F.pmod(F.xxhash64(canon_url, F.lit(SALT_SEED)), F.lit(salt_width)).cast("int")


# target upper bound for one (host, salt) window partition's row count; a
# hotter host gets proportionally more salts (SURVEY §4.2: salt width chosen
# from the host histogram)
ROWS_PER_SALT = 50_000


def choose_salt_width(pending: DataFrame) -> int:
    """Pick the salt width from the pending pool's host histogram: enough
    salts that even the hottest host's rows split into ~ROWS_PER_SALT-row
    window partitions. Selection output is salt-width-invariant (see module
    docstring), so this is a purely physical choice — computed once per
    campaign (the histogram only shrinks as the pool drains)."""
    hottest = (
        pending.groupBy("host").count().agg(F.max("count")).collect()[0][0] or 0
    )
    return max(1, min(256, -(-int(hottest) // ROWS_PER_SALT)))


def with_host_budget(
    pending: DataFrame,
    robots: DataFrame,
    default_budget: int,
    wave_period_s: float = DEFAULT_WAVE_PERIOD_S,
) -> DataFrame:
    """Left-broadcast-join the robots politeness dimension (small: one row per
    host) onto pending. Effective budget = min(max_per_wave cap, crawl-delay-
    derived rate floor(wave_period / crawl_delay_s)); unknown hosts get the
    default budget at the reference's global DELAY=1 s."""
    cols = ["host", "max_per_wave"]
    budgets = robots.select(*cols, *(
        [F.col("crawl_delay_s")] if "crawl_delay_s" in robots.columns
        else [F.lit(None).cast("double").alias("crawl_delay_s")]
    ))
    delay = F.when(
        F.col("crawl_delay_s").isNull() | (F.col("crawl_delay_s") <= 0),
        F.lit(DEFAULT_CRAWL_DELAY_S),
    ).otherwise(F.col("crawl_delay_s"))
    return (
        pending.join(F.broadcast(budgets), "host", "left")
        .withColumn(
            "host_budget",
            F.least(
                F.coalesce(F.col("max_per_wave"), F.lit(default_budget)),
                F.floor(F.lit(float(wave_period_s)) / delay).cast("int"),
            ),
        )
        .drop("max_per_wave", "crawl_delay_s")
    )


def select_wave(
    pending: DataFrame,
    robots: DataFrame,
    wave_id: int,
    batch_size: int,
    default_budget: int = DEFAULT_BUDGET,
    salt_width: int = 8,
    wave_period_s: float = DEFAULT_WAVE_PERIOD_S,
) -> DataFrame:
    """Pick this wave's rows from pending (which already includes any
    retries — the scheduler unions them in). Returns pending columns +
    (wave_id, order_in_wave). Deterministic and plan-independent."""
    order = [F.col("priority").desc(), F.col("seq").asc()]

    cand = with_host_budget(pending, robots, default_budget, wave_period_s)
    if salt_width > 1:
        # phase 1: bound each host to <= salt_width*cap survivors. One hash
        # exchange on (host, salt) — the salt splits a hot host across
        # partitions; an Iceberg pool bucketed on these keys reads
        # pre-clustered and skips the exchange entirely.
        w1 = Window.partitionBy("host", "salt").orderBy(*order)
        cand = cand.withColumn("_r1", F.row_number().over(w1)).filter(
            F.col("_r1") <= F.col("host_budget")
        ).drop("_r1")
    # phase 2: exact per-host rank over the (now bounded per host) candidates
    w2 = Window.partitionBy("host").orderBy(*order)
    eligible = (
        cand.withColumn("_hr", F.row_number().over(w2))
        .filter(F.col("_hr") <= F.col("host_budget"))
        .drop("_hr", "host_budget")
    )
    # global top-batch_size in order: planned as TakeOrderedAndProject
    # (distributed top-k, no full sort). order_in_wave is then assigned on
    # <= batch_size rows, so the single-partition window is bounded.
    top = eligible.orderBy(*order).limit(batch_size)
    w3 = Window.orderBy(*order)
    return top.withColumn("order_in_wave", F.row_number().over(w3)).withColumn(
        "wave_id", F.lit(wave_id)
    )
