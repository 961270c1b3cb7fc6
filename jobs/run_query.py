"""Run any registered analytics query via spark-submit — the interactive
query surface of the reference (vv8cli + the SQL snippets users run against
the mega schema, scripts/fetch.py / eval_banks.py shapes) as one entry
point over the Spark-native registry:

    spark-submit --py-files vv8spark.zip jobs/run_query.py --list
    spark-submit --py-files vv8spark.zip jobs/run_query.py \
        --name star_join_revenue --sf-dir /root/testdata/sf0.01 --limit 20
    ... --explain           # print the physical plan instead of rows
    ... --format json       # one JSON object per row (pipe to jq)

Every query is a pure function (SparkSession, sf_dir) -> DataFrame from
visiblev8_crawler_spark.plans; this wrapper adds no semantics of its own.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--name", help="registered query name (see --list)")
    ap.add_argument("--list", action="store_true", help="list queries and exit")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50, help="max rows to show (0 = all)")
    ap.add_argument("--format", choices=["table", "json"], default="table")
    ap.add_argument(
        "--explain", action="store_true", help="print the physical plan, not rows"
    )
    return ap


def run(spark, args) -> int:
    from visiblev8_crawler_spark.plans import (  # noqa: F401 (registration)
        annops,
        imageops,
        inference,
        queries,
        textops,
    )

    reg = queries.QUERIES
    if args.list or not args.name:
        for name, spec in sorted(reg.items()):
            kind = "oracle" if spec.oracle else "pytest/tolerance"
            print(f"{name:36s} [{kind}] {spec.note.split('.')[0][:80]}")
        return 0
    if args.name not in reg:
        print(f"unknown query {args.name!r}; use --list", file=sys.stderr)
        return 2
    df = reg[args.name].spark(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.limit:
        df = df.limit(args.limit)
    if args.format == "json":
        for row in df.toJSON().collect():
            print(row)
    else:
        df.show(args.limit or df.count(), truncate=False)
    return 0


def main() -> None:
    args = build_parser().parse_args()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("vv8-query")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    code = run(spark, args)
    spark.stop()
    sys.exit(code)


if __name__ == "__main__":
    main()
