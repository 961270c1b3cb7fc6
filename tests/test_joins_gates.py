"""events_asof_join / events_range_join correctness + plan gates.

Both are pytest-oracled this round (rotation policy, __spark_entry__.py):
DuckDB replicas run the SQL kept next to the Spark plan. The planted test
pins the tie rules the docstrings promise; the plan locks pin the scale
shape (as-of compiles to a WINDOW, not a join; range join compiles to an
equi-join, never a nested-loop/cartesian).
"""

import os
import tempfile

import duckdb

from visiblev8_crawler_spark.plans.queries import (
    QUERIES,
    _ASOF_ORACLE_SQL,
    _RANGE_JOIN_ORACLE_SQL,
    events_asof_join,
)

SF_DIR = "/root/testdata/sf0.01"


def _replica(name, sql, spark):
    got = [tuple(r) for r in QUERIES[name].spark(spark, SF_DIR).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert len(got) == len(want) > 0
    assert got == want


def test_asof_oracle_replica(spark):
    _replica("events_asof_join", _ASOF_ORACLE_SQL, spark)


def test_range_join_oracle_replica(spark):
    _replica("events_range_join", _RANGE_JOIN_ORACLE_SQL, spark)


def test_asof_planted_ties(spark):
    """Pin the documented tie rules: inclusive match at equal ts; among
    equal-ts refs the highest event_id wins; probe before any ref -> null."""
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),
        (2, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),     # same-ts ref, higher id
        (3, "2024-01-01 10:00:00", 7, "purchase", 1.0, "{}"),  # tie with refs -> id 2
        (4, "2024-01-01 11:00:00", 7, "purchase", 1.0, "{}"),  # later -> still id 2
        (5, "2024-01-01 09:00:00", 8, "purchase", 1.0, "{}"),  # user 8: no click yet
        (6, "2024-01-01 09:30:00", 8, "click", 1.0, "{}"),
        (7, "2024-01-01 09:45:00", 8, "purchase", 1.0, "{}"),  # -> id 6, gap 900s
    ]
    d = tempfile.mkdtemp(prefix="asof_")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r["event_id"]: r for r in events_asof_join(spark, d).collect()}
    assert out[3]["click_id"] == 2 and out[3]["gap_micros"] == 0
    assert out[4]["click_id"] == 2 and out[4]["gap_micros"] == 3600 * 1_000_000
    assert out[5]["click_id"] is None and out[5]["gap_micros"] is None
    assert out[7]["click_id"] == 6 and out[7]["gap_micros"] == 900 * 1_000_000


def test_asof_plan_is_window_not_join(spark):
    """The whole point of the operator: NO join node — one hash exchange
    (the per-user window) plus the determinism sort."""
    p = (
        QUERIES["events_asof_join"]
        .spark(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_range_join_plan_is_equi_join(spark):
    """The binned band join must compile to a hash/sort-merge EQUI-join on
    (user_id, bin) — never the nested-loop/cartesian Spark picks for raw
    inequality joins."""
    p = (
        QUERIES["events_range_join"]
        .spark(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_pivot_null_keys_planted(spark):
    """NULL source must form its own group and NULL lang must count into
    n_other — the single-scan bucketed pivot cannot lose either (the
    failure mode of a non-null-safe second-scan join)."""
    from visiblev8_crawler_spark.plans.queries import (
        _PIVOT_ORACLE_SQL,
        docs_lang_pivot,
    )

    rows = [
        (1, "a", "en", "web", 10),
        (2, "b", None, "web", 10),      # NULL lang -> n_other
        (3, "c", "xx", None, 10),       # NULL source group, unlisted lang
        (4, "d", "de", None, 10),       # NULL source group, listed lang
    ]
    d = tempfile.mkdtemp(prefix="pivot_")
    path = os.path.join(d, "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(path)
    # repr key: None is not orderable against str
    got = sorted(
        (tuple(r) for r in docs_lang_pivot(spark, d).collect()), key=repr
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    want = sorted(
        (tuple(r) for r in con.execute(_PIVOT_ORACLE_SQL).fetchall()), key=repr
    )
    assert got == want
    by_src = {r[0]: r for r in got}
    assert by_src["web"][-1] == 1          # the NULL-lang doc
    assert by_src[None][-1] == 1           # the unlisted-lang doc
    assert by_src[None][2] == 1            # n_de in the NULL-source group
