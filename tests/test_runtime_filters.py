"""Executable evidence for the two RUNTIME scale defenses the 100 TB story
leans on but small-SF correctness tests never exercise:

1. **Runtime bloom-filter join pushdown** — on a selective dim-filtered
   fact join too big to broadcast, Catalyst injects a bloom filter built
   from the dim side into the fact-side scan (`might_contain`), cutting
   the shuffled fact rows to the semi-join cardinality. At cluster scale
   the default thresholds (creation side <= 10 MB, application side
   >= 10 GB scan) engage on their own; here they are scaled to the
   sandbox data so the PLAN SHAPE itself is pinned.

2. **AQE skew-join split** — a sort-merge join with one hot key must come
   out of adaptive execution with the skewed partition SPLIT
   (`SortMergeJoin(skew=true)` in the final plan), the engine-level
   complement to the scheduler's application-level salting
   (operators/waves.py; tools/bench_skew.py measures that defense).

Both tests save/restore every conf they touch — the session fixture is
shared.
"""

from contextlib import contextmanager

import pyspark.sql.functions as F


@contextmanager
def _confs(spark, **kv):
    saved = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, old in saved.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def test_runtime_bloom_filter_injected_on_selective_fact_join(spark):
    with _confs(
        spark,
        **{
            "spark__sql__optimizer__runtime__bloomFilter__enabled": "true",
            "spark__sql__optimizer__runtime__bloomFilter__creationSideThreshold": "10MB",
            # sandbox scale-down of the 10 GB default so the rule fires on
            # a 60k-row lineitem; at 100 TB the default engages unmodified
            "spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold": "1KB",
            # force the non-broadcast regime the rule exists for
            "spark__sql__autoBroadcastJoinThreshold": "-1",
        },
    ):
        orders = (
            spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
            .filter(F.col("o_orderpriority") == "1-URGENT")
        )
        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt
        # and it still computes the right thing under the injected filter
        rows = j.collect()
        assert len(rows) == 1 and rows[0]["n"] > 0


def test_aqe_splits_skewed_sort_merge_join(spark):
    with _confs(
        spark,
        **{
            "spark__sql__adaptive__skewJoin__enabled": "true",
            # sandbox scale-down of the 256 MB/medians machinery so a
            # 400k-row hot key trips it; at cluster scale the defaults fire
            "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "100KB",
            "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "2",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "50KB",
            # the post-join aggregate needs hash distribution; allow the
            # split to proceed anyway (the extra shuffle is the price)
            "spark__sql__adaptive__forceOptimizeSkewedJoin": "true",
            "spark__sql__autoBroadcastJoinThreshold": "-1",
        },
    ):
        n = 400_000
        left = (
            spark.range(n)
            .withColumn(
                "k",
                F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")),
            )
            .withColumn("pay", F.md5(F.col("id").cast("string")))
        )
        right = (
            spark.range(2000)
            .withColumn("k", F.col("id"))
            .withColumn("rpay", F.md5(F.col("id").cast("string")))
        )
        j = left.join(right, "k").select(F.sum(F.length("pay")).alias("s"))
        got = j.collect()[0]["s"]
        # 90% of left rows share k=0 (joins right k=0); the 10% tail joins
        # only where id < 2000 -> ids 2000-(n-1) with id%10==9 drop out
        expect = 32 * (9 * n // 10 + sum(1 for i in range(2000) if i % 10 == 9))
        assert got == expect, (got, expect)
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in p, p[:500]
        assert "skew=true" in p, p
