"""Data-layout scale levers, pinned executable (companion to
test_runtime_filters.py): the two storage-side defenses the 100 TB story
uses that correctness tests never exercise.

1. **Hive-style partition pruning** — a corpus written
   `partitionBy("lang")` must serve a lang-filtered scan from partition
   METADATA: the predicate lands in `PartitionFilters` (directories never
   listed, files never opened), not in a post-scan Filter node. At 100 TB
   this is the difference between reading one language's shard and
   listing the world.

2. **Bucketed co-located join** — two tables `bucketBy(8, key)` on the
   join key must sort-merge-join with ZERO hash exchanges: the bucket
   layout IS the shuffle, paid once at write time and amortized over
   every subsequent join. This is the engine mechanism behind the
   catalog-level claims ("the vec_id join co-partitions with table
   layout at cluster scale") — now proven, not narrated.

Tables are written to tmp via explicit `path` options so the repo tree
and the default warehouse stay untouched; catalog entries are dropped.
"""

import os

import pyspark.sql.functions as F


def test_partition_pruning_serves_filter_from_metadata(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("layout_part"))
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs.write.partitionBy("lang").mode("overwrite").parquet(os.path.join(d, "by_lang"))

    r = (
        spark.read.parquet(os.path.join(d, "by_lang"))
        .filter(F.col("lang") == "en")
        .select("doc_id")
    )
    p = r._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in p, p
    i = p.find("PartitionFilters")
    assert "lang" in p[i : i + 120], p[i : i + 120]
    # the predicate must NOT survive as a post-scan Filter node
    assert "Filter" not in p.split("FileScan")[0], p
    # and the pruned read returns exactly the filtered rows
    want = docs.filter(F.col("lang") == "en").count()
    assert r.count() == want > 0


def test_bucketed_join_runs_with_zero_exchanges(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("layout_bucket"))
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    try:
        (
            docs.write.bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .option("path", os.path.join(d, "docs_b"))
            .mode("overwrite")
            .saveAsTable("layout_docs_b")
        )
        (
            emb.write.bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .option("path", os.path.join(d, "emb_b"))
            .mode("overwrite")
            .saveAsTable("layout_emb_b")
        )
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = (
                spark.table("layout_docs_b")
                .join(spark.table("layout_emb_b"), "doc_id")
                .select(F.count("*").alias("n"))
            )
            n = j.collect()[0]["n"]
            p = j._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        assert "SortMergeJoin" in p, p
        assert p.count("Exchange hashpartitioning") == 0, p
        # same answer as the layout-oblivious join
        assert n == docs.join(emb, "doc_id").count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS layout_docs_b")
        spark.sql("DROP TABLE IF EXISTS layout_emb_b")
