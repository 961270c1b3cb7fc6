"""_TableHostState (cluster-path politeness state) equivalence gate.

VERDICT r3 #3: the 10^8-host path — politeness state as a catalog table
merged atomically per wave — must be implemented behind a threshold and
proven equivalent to the driver-dict path: same campaign, bit-identical
selection (fetches ledger) and bit-identical final state (credit doubles
compared exactly; all paths share the politeness_exprs IEEE arithmetic).
"""

import pytest
from pyspark.sql import functions as F

from visiblev8_crawler_spark.streaming import scheduler
from visiblev8_crawler_spark.streaming.scheduler import CrawlConfig

BATCH = 150
# demote_after_failures=2 so the abuse-demotion branch BINDS in this small
# world (~10% of fetches fail): equivalence must hold through demotion, not
# just the happy token-bucket path
CFG_KW = dict(batch_size=BATCH, demote_after_failures=2)


def _run(spark, world, tmp_path_factory, mode, **kw):
    root = str(tmp_path_factory.mktemp(f"cat_hs_{mode}"))
    frontier = spark.read.parquet(world["paths"]["frontier"])
    robots = spark.read.parquet(world["paths"]["robots"])
    images = spark.read.parquet(world["paths"]["images"])
    cfg = CrawlConfig(host_state_mode=mode, **CFG_KW, **kw)
    cat = scheduler.run_campaign(spark, root, frontier, robots, images, cfg, **{})
    return cat, cfg, (frontier, robots, images, root)


def _fetch_rows(cat):
    return {
        (r["canon_url"], r["attempt"], r["wave_id"], r["order_in_wave"], r["status"])
        for r in cat.read("fetches").collect()
    }


def _state_rows(df):
    # credit compared EXACTLY (no tolerance): the dict, the table merge and
    # the resume fold all run the same IEEE-double operation order
    return {
        r["host"]: (r["credit"], r["last_wave"], r["ok"], r["failed"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def dict_run(spark, world, tmp_path_factory):
    return _run(spark, world, tmp_path_factory, "dict")


@pytest.fixture(scope="module")
def table_run(spark, world, tmp_path_factory):
    return _run(spark, world, tmp_path_factory, "table")


def test_selection_bit_identical(dict_run, table_run):
    """Every fetch row — url, attempt, wave, in-wave order, verdict — equal
    between the dict and table politeness paths."""
    assert _fetch_rows(dict_run[0]) == _fetch_rows(table_run[0])


def test_final_state_bit_identical(spark, world, dict_run, table_run):
    """The committed host_state table == the ledger fold of the dict-path
    catalog == the ledger fold of its own catalog (state is still a
    projection of fetches, just materialized)."""
    cat_d = dict_run[0]
    cat_t, cfg, _ = table_run
    robots = spark.read.parquet(world["paths"]["robots"])

    table_state = _state_rows(scheduler.host_state_view(cat_t))
    assert table_state, "table mode committed no host_state rows"

    for cat in (cat_d, cat_t):
        fold = scheduler.host_state_df(
            cat, robots, cfg.default_budget, cfg.wave_period_s,
            cfg.demote_after_failures, cfg.demote_factor,
        )
        assert _state_rows(fold) == table_state


def test_table_mode_kill_resume(spark, world, tmp_path_factory, table_run):
    """Kill after 2 waves, resume in table mode: final ledger and state
    table byte-equal to the uninterrupted table-mode campaign."""
    root = str(tmp_path_factory.mktemp("cat_hs_resume"))
    frontier = spark.read.parquet(world["paths"]["frontier"])
    robots = spark.read.parquet(world["paths"]["robots"])
    images = spark.read.parquet(world["paths"]["images"])
    cfg = CrawlConfig(host_state_mode="table", **CFG_KW)
    cat = scheduler.run_campaign(
        spark, root, frontier, robots, images, cfg, stop_after_waves=2
    )
    assert cat.watermark() == 1
    # one delta set per committed wave, in the same manifest swaps
    assert cat.file_sets("host_state") == 2
    cat = scheduler.run_campaign(spark, root, frontier, robots, images, cfg)

    assert _fetch_rows(cat) == _fetch_rows(table_run[0])
    assert _state_rows(scheduler.host_state_view(cat)) == _state_rows(
        scheduler.host_state_view(table_run[0])
    )


def test_auto_threshold_picks_table(spark, world, tmp_path_factory):
    """host_state_mode='auto' with a threshold below the world's host count
    must take the table path (and still drain the campaign)."""
    root = str(tmp_path_factory.mktemp("cat_hs_auto"))
    frontier = spark.read.parquet(world["paths"]["frontier"])
    robots = spark.read.parquet(world["paths"]["robots"])
    images = spark.read.parquet(world["paths"]["images"])
    cfg = CrawlConfig(
        host_state_mode="auto", host_state_broadcast_max=5,
        host_state_fold_every=3, **CFG_KW
    )
    cat = scheduler.run_campaign(spark, root, frontier, robots, images, cfg)
    assert cat.file_sets("host_state") >= 1, "auto mode did not materialize state"
    # the merge-on-read fold bounds delta accumulation at the fold cadence
    assert cat.file_sets("host_state") <= 3 + 1, cat.file_sets("host_state")
    assert scheduler.pending_df(cat).count() == 0
    # and the folded table has exactly one row per host
    view = scheduler.host_state_view(cat)
    raw = cat.read("host_state")
    hosts = view.count()
    assert raw.select("host").distinct().count() == hosts


def test_auto_resume_keeps_pinned_mode(spark, world, tmp_path_factory, table_run):
    """The chosen storage mode is pinned in the manifest at first
    resolution: a campaign started in table mode and resumed under 'auto'
    must STAY in table mode even though the census (tiny world, huge
    broadcast threshold) would pick dict — approx_count_distinct error at
    the threshold boundary must never flip modes mid-campaign."""
    root = str(tmp_path_factory.mktemp("cat_hs_pin"))
    frontier = spark.read.parquet(world["paths"]["frontier"])
    robots = spark.read.parquet(world["paths"]["robots"])
    images = spark.read.parquet(world["paths"]["images"])
    cat = scheduler.run_campaign(
        spark, root, frontier, robots, images,
        CrawlConfig(host_state_mode="table", **CFG_KW), stop_after_waves=2,
    )
    assert cat.meta("host_state_mode") == "table"
    sets_at_kill = cat.file_sets("host_state")
    assert sets_at_kill == 2

    # resume under auto: census would say dict (world hosts << threshold)
    cat = scheduler.run_campaign(
        spark, root, frontier, robots, images,
        CrawlConfig(host_state_mode="auto", host_state_broadcast_max=10**9, **CFG_KW),
    )
    assert cat.meta("host_state_mode") == "table"
    # table mode kept appending per-wave deltas after the resume
    assert cat.file_sets("host_state") > sets_at_kill
    # and the outcome is byte-equal to the uninterrupted table-mode run
    assert _fetch_rows(cat) == _fetch_rows(table_run[0])
    assert _state_rows(scheduler.host_state_view(cat)) == _state_rows(
        scheduler.host_state_view(table_run[0])
    )


def test_auto_resume_ratchets_dict_to_table(spark, world, tmp_path_factory, table_run):
    """The pin is a one-way ratchet: a campaign pinned 'dict' whose pool
    sits above the (now smaller) broadcast threshold on resume must UPGRADE
    to table mode — the pool-outgrew-broadcast path — instead of honoring a
    stale dict pin into a driver-side collect of the whole host universe.
    Selection stays bit-identical through the switch (both modes are
    equivalence-proven; the table bootstrap folds the committed ledger)."""
    root = str(tmp_path_factory.mktemp("cat_hs_ratchet"))
    frontier = spark.read.parquet(world["paths"]["frontier"])
    robots = spark.read.parquet(world["paths"]["robots"])
    images = spark.read.parquet(world["paths"]["images"])
    cat = scheduler.run_campaign(
        spark, root, frontier, robots, images,
        CrawlConfig(host_state_mode="auto", host_state_broadcast_max=10**9, **CFG_KW),
        stop_after_waves=2,
    )
    assert cat.meta("host_state_mode") == "dict"
    assert cat.file_sets("host_state") == 0

    # resume with the threshold below the world's host count: census says
    # table; the dict pin must ratchet up, re-pin, and finish in table mode
    cat = scheduler.run_campaign(
        spark, root, frontier, robots, images,
        CrawlConfig(host_state_mode="auto", host_state_broadcast_max=5, **CFG_KW),
    )
    assert cat.meta("host_state_mode") == "table"
    assert cat.file_sets("host_state") > 0
    assert _fetch_rows(cat) == _fetch_rows(table_run[0])
