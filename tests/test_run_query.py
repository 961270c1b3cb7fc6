"""jobs/run_query.py — the spark-submit analytics entry point: list, run,
json output, explain, and unknown-name handling (exercised in-process with
the session fixture; the spark-submit path shares main()'s run())."""

import json

from jobs.run_query import build_parser, run


def _args(*argv):
    return build_parser().parse_args(list(argv))


def test_list_names_every_registered_query(spark, capsys):
    assert run(spark, _args("--list")) == 0
    out = capsys.readouterr().out
    for name in ("star_join_revenue", "benchmark_contamination", "embedding_lsh_multiprobe_topk"):
        assert name in out


def test_run_query_json_rows(spark, capsys):
    rc = run(
        spark,
        _args("--name", "top_k_orders", "--sf-dir", "/root/testdata/sf0.001",
              "--format", "json", "--limit", "5"),
    )
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(rows) <= 5
    assert all("o_orderkey" in r or len(r) > 0 for r in rows)


def test_explain_prints_plan_not_rows(spark, capsys):
    rc = run(
        spark,
        _args("--name", "star_join_revenue", "--sf-dir", "/root/testdata/sf0.001",
              "--explain"),
    )
    assert rc == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_unknown_query_is_clean_error(spark, capsys):
    rc = run(spark, _args("--name", "no_such_query"))
    assert rc == 2
    assert "unknown query" in capsys.readouterr().err
