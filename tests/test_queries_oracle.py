"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its SQL oracle on DuckDB over the same sf0.001 parquet,
compare row count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

# default sf0.001 for speed; CI can sweep the driver's sf0.01 gate with
#   VV8_ORACLE_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_queries_oracle.py
SF_DIR = os.environ.get("VV8_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


ORACLED = sorted(entry_mod.oracle_sql().keys())

# Queries demoted from the driver's saturated 50-slot oracle window
# (rotation policy, __spark_entry__.py): their SQL oracles live on as
# module constants and are replicated here verbatim, so external
# verification never lapses — it just moves engines.
DEMOTED_ORACLES = {
    "capped_count": "_CAPPED_COUNT_ORACLE_SQL",
    "union_distinct_hosts": "_UNION_DISTINCT_HOSTS_ORACLE_SQL",
    "case_bucket_classify": "_CASE_BUCKET_ORACLE_SQL",
    "semi_join_active_parts": "_SEMI_JOIN_ORACLE_SQL",
}

# Round-5 late additions, BORN outside the pinned 50-slot window (rotation
# policy: newest-in next round). Same replica mechanism as the demotions;
# ops with dedicated gate files (asof/range/canonicalize/quantize) are
# replicated there instead.
NEWBORN_ORACLES = {
    "customer_rollup": "_ROLLUP_ORACLE_SQL",
    "docs_lang_pivot": "_PIVOT_ORACLE_SQL",
    "events_funnel": "_FUNNEL_ORACLE_SQL",
    "orders_retention_cohort": "_COHORT_ORACLE_SQL",
    "events_hopping_window": "_HOPPING_ORACLE_SQL",
    "events_session_window": "_SESSION_WINDOW_ORACLE_SQL",
}

REPLICA_ORACLES = {**DEMOTED_ORACLES, **NEWBORN_ORACLES}


@pytest.mark.parametrize("name", sorted(REPLICA_ORACLES))
def test_demoted_query_matches_pytest_oracle(spark, ddb, name):
    from visiblev8_crawler_spark.plans import queries as qmod

    sql = getattr(qmod, REPLICA_ORACLES[name])
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = ddb.sql(sql)
    duck_cols = [c.lower() for c in res.columns]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows) > 0
    assert _rows_to_set(spark_cols, spark_rows) == _rows_to_set(duck_cols, duck_rows)


def test_driver_window_pinned_at_50():
    """The rotation policy's invariant: exactly 50 oracled queries, all
    inside the driver's hard-signal window, newest operators included."""
    oracled = entry_mod.oracle_sql()
    assert len(oracled) == 50, len(oracled)
    ordered = list(entry_mod.queries())
    assert set(ordered[:50]) == set(oracled), "oracled queries must lead the iteration order"
    assert "embedding_lsh_multiprobe_topk" in oracled
    assert "benchmark_contamination" in oracled
    assert "doc_gopher_repetition" in oracled
    assert "image_phash_neardup_pairs" in oracled
    for demoted in DEMOTED_ORACLES:
        assert demoted not in oracled, demoted


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    qs = entry_mod.queries()
    sdf = qs[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.sql(entry_mod.oracle_sql()[name])
    duck_cols = [c.lower() for c in res.columns]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), f"{name}: {len(spark_rows)} vs {len(duck_rows)}"
    assert len(spark_rows) > 0, f"{name}: empty result proves nothing"
    a = _rows_to_set(spark_cols, spark_rows)
    b = _rows_to_set(duck_cols, duck_rows)
    assert a == b, f"{name}: value mismatch\nspark sample: {a[:3]}\nduck sample:  {b[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 2


def test_approx_percentiles_within_bound(spark, ddb):
    """price_percentiles_approx has no cross-engine oracle (sketch results
    differ); every group's p50/p90/p99 must land within 2% of the exact
    quantile — the declared-tolerance gate the exact query's docstring
    promised for the 100 TB swap."""
    rows = entry_mod.queries()["price_percentiles_approx"](spark, SF_DIR).collect()
    exact = {
        r[0]: r[1:]
        for r in ddb.sql(
            """
            SELECT o_orderpriority,
                   quantile_cont(o_totalprice, 0.5),
                   quantile_cont(o_totalprice, 0.9),
                   quantile_cont(o_totalprice, 0.99)
            FROM orders GROUP BY o_orderpriority
            """
        ).fetchall()
    }
    assert len(rows) == len(exact) and rows
    for r in rows:
        want = exact[r["o_orderpriority"]]
        for got, exp in zip((r["p50"], r["p90"], r["p99"]), want):
            assert abs(got - exp) / exp < 0.02, (r["o_orderpriority"], got, exp)


def test_approx_distinct_within_bound(spark, ddb):
    """approx_count_distinct has no cross-engine oracle (HLL sketches differ);
    check the estimate against the exact cardinality instead."""
    row = entry_mod.queries()["approx_distinct_sources"](spark, SF_DIR).collect()[0]
    exact_sources, exact_docs = ddb.sql(
        "SELECT COUNT(DISTINCT source), COUNT(DISTINCT doc_id) FROM documents"
    ).fetchall()[0]
    assert abs(row["approx_sources"] - exact_sources) / exact_sources < 0.05
    assert abs(row["approx_docs"] - exact_docs) / exact_docs < 0.05


def test_hopping_window_planted_membership(spark, tmp_path):
    """Window-membership semantics pinned: an event exactly ON a 15-min
    grid start belongs to exactly 4 hourly windows (its own start and the
    three preceding slides); an event mid-slot belongs to the 4 windows
    covering it, never one that ends at its timestamp."""
    import datetime

    from visiblev8_crawler_spark.plans.queries import events_hopping_window

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)       # on-grid
    mid = datetime.datetime(2024, 1, 1, 12, 7, 30)       # mid-slot
    rows = [
        (1, base, 10, "view", 1.0, "{}"),
        (2, mid, 11, "click", 2.0, "{}"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {}
    for r in events_hopping_window(spark, d).collect():
        got.setdefault(r["event_type"], []).append(r["win_start"])
    e = int(base.replace(tzinfo=datetime.timezone.utc).timestamp())
    assert got["view"] == [e - 2700, e - 1800, e - 900, e]
    # mid-slot event: grid floor is e (12:00), so same 4 windows
    assert got["click"] == [e - 2700, e - 1800, e - 900, e]


def test_session_window_boundary_and_manual_equivalence(spark, tmp_path):
    """Native F.session_window semantics pinned: an event EXACTLY at the
    open window's end still merges (end-inclusive merge, i.e. a new
    session needs the gap STRICTLY exceeded), one microsecond past it
    splits; and the native plan equals a manual gaps-and-islands plan
    with the same strict-> boundary rule on the real table."""
    import datetime

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from visiblev8_crawler_spark.plans.queries import events_session_window

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    gap = datetime.timedelta(minutes=30)
    us = datetime.timedelta(microseconds=1)
    rows = [
        (1, t0, 10, "view", 1.0, "{}"),
        (2, t0 + gap, 10, "view", 2.0, "{}"),              # == gap -> merges
        (3, t0 + 2 * gap + us, 10, "view", 3.0, "{}"),     # > gap -> NEW session
        (4, t0, 11, "view", 4.0, "{}"),                    # second user, lone event
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in events_session_window(spark, d).collect()
    )
    assert got == [
        (10, t0, t0 + 2 * gap, 2, 3.0),
        (10, t0 + 2 * gap + us, t0 + 3 * gap + us, 1, 3.0),
        (11, t0, t0 + gap, 1, 4.0),
    ], got

    # manual gaps-and-islands with the strict-> rule must agree on the real table
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("ts").over(w)
    is_start = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    sess = F.sum(is_start).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    manual = sorted(
        tuple(r)
        for r in ev.withColumn("sess", sess)
        .groupBy("user_id", "sess")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .drop("sess")
        .collect()
    )
    native = sorted(tuple(r) for r in events_session_window(spark, SF_DIR).collect())
    assert native == manual


def test_every_no_oracle_query_declares_a_pytest_gate():
    """Discipline lock for the rotation policy: a query outside the
    driver's 50-slot hard-signal window must name its pytest gate here —
    an operator can never ship with NO correctness check. (The driver
    still runs a rows-only check on these; this pins the stronger one.)"""
    GATES = {
        # sketches: tolerance gates (cross-engine sketch states differ)
        "price_percentiles_approx": "test_queries_oracle.py::test_approx_percentiles_within_bound",
        "approx_distinct_sources": "test_queries_oracle.py::test_approx_distinct_within_bound",
        # demoted/newborn DuckDB replicas (this file)
        "semi_join_active_parts": "REPLICA_ORACLES",
        "case_bucket_classify": "REPLICA_ORACLES",
        "capped_count": "REPLICA_ORACLES",
        "union_distinct_hosts": "REPLICA_ORACLES",
        "customer_rollup": "REPLICA_ORACLES",
        "docs_lang_pivot": "REPLICA_ORACLES",
        "events_funnel": "REPLICA_ORACLES",
        "orders_retention_cohort": "REPLICA_ORACLES",
        "events_hopping_window": "REPLICA_ORACLES",
        "events_session_window": "REPLICA_ORACLES",
        # dedicated gate files
        "events_asof_join": "test_joins_gates.py",
        "events_range_join": "test_joins_gates.py",
        "embedding_lsh_neardup_pairs_incremental": "test_ann_gates.py",
        "embedding_kmeans_train": "test_kmeans_gate.py",
        "embedding_pca_project": "test_pca_gate.py",
        "embedding_quantize_int8": "test_ann_gates.py",
        "embedding_quantized_topk": "test_ann_gates.py",
        "embedding_knn_join": "test_ann_gates.py",
        "video_frame_overlap": "test_video_overlap.py",
        "audio_frame_features": "test_imageops.py",
        "doc_pack_sequences": "test_packing.py",
        "minhash_lsh_pairs_incremental": "test_textops_gates.py",
        "doc_pii_scrub": "test_textops_gates.py",
        "doc_neardup_canonicalize": "test_textops_gates.py",
        "doc_duplicate_spans": "test_textops_gates.py",
        "doc_scrub_duplicate_spans": "test_textops_gates.py",
        "corpus_mix_weights": "test_textops_gates.py",
        "corpus_mix_sample": "test_textops_gates.py",
        "doc_unigram_logppl": "test_textops_gates.py",
        "doc_chunk_overlap": "test_textops_gates.py",
        "doc_heavy_tokens_topk": "test_textops_gates.py",
    }
    from visiblev8_crawler_spark.plans.queries import QUERIES

    no_oracle = {n for n, spec in QUERIES.items() if spec.oracle is None}
    missing = no_oracle - set(GATES)
    assert not missing, f"no-oracle queries without a declared gate: {sorted(missing)}"
    stale = set(GATES) - no_oracle
    assert not stale, f"gate entries for queries now oracled/removed: {sorted(stale)}"
