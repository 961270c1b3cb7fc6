"""Seed-list sources — the reference's frontier inputs as DataFrame scans.

S1: newline-delimited URL files (url_sender.py:52-79 ``read_urls_from_file``:
    strip each line, drop blanks; file order defines crawl order with 1-based
    ids, url_sender.py:235-237).
S2: the CLI single-url / file path variants (scripts/crawl.py:336-341) are
    the same scan with a one-row frontier.
S3: Tranco-style CSV ``rank,domain`` -> ``http://{domain}`` with the rank as
    priority-neutral sequence (scripts/crawl.py:342-348).

Order discipline: seq must equal file order at any parallelism. For text
files, ``zipWithIndex`` over the Hadoop line reader guarantees indices follow
(partition, offset) order, which for ordinary (splittable, single-glob) text
inputs is byte order — the same contract url_sender relies on by reading
sequentially. The Tranco CSV carries its own explicit rank column, so no
positional trick is needed there (prefer explicit ranks whenever the format
has them).

Blank lines are *kept* (seq assigned, url empty): prepare_frontier rejects
them as 'invalid' so the rejected ledger accounts for every input line,
mirroring url_sender's progress accounting (url_sender.py:146-200).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def frontier_from_text(spark: SparkSession, path: str, task_id: str = "seedfile") -> DataFrame:
    """S1: newline URL file -> (seq, url, priority, task_id); seq is the
    1-based line number (url_sender.py:237)."""
    lines = spark.sparkContext.textFile(path).zipWithIndex()
    df = lines.toDF(["url", "idx"])
    return df.select(
        (F.col("idx") + 1).cast("long").alias("seq"),
        F.trim(F.col("url")).alias("url"),
        F.lit(0).alias("priority"),
        F.lit(task_id).alias("task_id"),
    )


def frontier_from_tranco_csv(
    spark: SparkSession, path: str, scheme: str = "http", task_id: str = "tranco"
) -> DataFrame:
    """S3: rank,domain CSV -> (seq=rank, url=scheme://domain, ...). Rows with
    a non-numeric rank or empty domain are dropped (the reference would
    crash; we filter — same surviving set for well-formed files)."""
    raw = spark.read.csv(path, header=False).toDF("rank", "domain")
    return (
        raw.withColumn("seq", F.col("rank").try_cast("long"))  # ANSI-safe: bad ranks -> null -> dropped
        .filter(F.col("seq").isNotNull() & (F.trim(F.col("domain")) != ""))
        .select(
            "seq",
            F.concat(F.lit(f"{scheme}://"), F.trim(F.col("domain"))).alias("url"),
            F.lit(0).alias("priority"),
            F.lit(task_id).alias("task_id"),
        )
    )
