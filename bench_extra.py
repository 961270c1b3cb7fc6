"""Optimization-round measurement harness (guide §1: noop-sink isolation,
labeled jobs, per-query explain capture). bench.py is FROZEN for the
driver's measurement; this file exists so optimization work can time
individual queries without touching it.

Usage:
  python bench_extra.py --sf-dir /tmp/sfbench1.0 --queries embedding_knn_join ...
  python bench_extra.py --sf-dir /root/testdata/sf0.1 --all --runs 3
  python bench_extra.py --explain-dir plans/r06 --suffix _before --queries ...

Flags:
  --noop      time df.write.format('noop') instead of .collect() (isolates
              compute from driver-side row pickling)
  --collect   time .collect() exactly like bench.py (the driver's metric)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", nargs="*", default=[])
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--ui", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("vv8-bench-extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", str(args.ui).lower())
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = em.queries()
    names = list(qs) if args.all else args.queries
    spark.range(1000).count()
    for t in ("orders", "lineitem", "customer", "nation", "region",
              "events", "documents", "embeddings"):
        spark.read.parquet(f"{args.sf_dir}/{t}.parquet").count()

    results = {}
    for name in names:
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        ts = []
        for r in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {r}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "samples": ts,
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
