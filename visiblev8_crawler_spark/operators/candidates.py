"""JSONL candidate ingest — the reference's login-candidate preprocessing
(eval_banks.py:20-70 ``preprocess_candidates`` + the per-line JSONL scan at
eval_banks.py:151-169 / count_login_candidates.py:30-59, SURVEY rows S4 + D2)
as one declarative plan.

Semantics replayed exactly:
- one JSON document per line; malformed lines skipped (PERMISSIVE mode, the
  reference's try/except-continue)
- candidates live at landscape_analysis_result.login_page_candidates[];
  docs with no candidates contribute nothing ("No candidates found",
  processing_results.json golden)
- scan_domain = scan_config.domain, falling back to top-level domain
  (eval_banks.py:32-35)
- blank/whitespace URLs dropped (eval_banks.py:41-43)
- dedup by URL *within a document*: prefer the first candidate whose
  strategy is 'CRAWLING' (case-insensitive), else the first occurrence in
  array order (eval_banks.py:46-57) — expressed as a window over
  (doc, url) ordered by (not-crawling, array position)

Spark mapping notes: ``posexplode`` keeps the candidate's array position so
"first in group" is deterministic under any parallelism (the reference's
dict-insertion order). The returned frame is frontier-shaped and feeds
``scheduler.add_seeds`` directly; ``actions`` rides along as a JSON string
column (submissions.actions JSON, 3_vv8_backend_init.sql:12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def ingest_candidates(spark: SparkSession, path: str) -> DataFrame:
    """Read a candidates JSONL file -> (seq, url, priority, scan_domain,
    actions, task_id), deduped per (document, url) with CRAWLING preference.

    priority=1 for CRAWLING picks (the strategy preference downstream wave
    selection honors, eval_banks.py:50-56 + T6), else 0. seq is assigned in
    (document, url) order — deterministic for a given file."""
    raw = spark.read.option("mode", "PERMISSIVE").json(path)
    docs = raw.select(
        F.coalesce(F.col("scan_config.domain"), F.col("domain"), F.lit("")).alias(
            "scan_domain"
        ),
        F.coalesce(F.col("task_config.task_id"), F.lit("")).alias("task_id"),
        F.col("landscape_analysis_result.login_page_candidates").alias("cands"),
    ).filter(F.col("cands").isNotNull() & (F.size("cands") > 0))

    c = docs.select(
        "scan_domain",
        "task_id",
        F.posexplode("cands").alias("pos", "cand"),
    ).select(
        "scan_domain",
        "task_id",
        "pos",
        F.trim(F.col("cand.login_page_candidate")).alias("url"),
        F.upper(F.coalesce(F.col("cand.login_page_strategy"), F.lit(""))).alias("strategy"),
        F.to_json(F.col("cand.login_page_actions")).alias("actions"),
    ).filter(F.col("url") != "")

    # CRAWLING-preferred first-occurrence pick within (document, url)
    w = Window.partitionBy("scan_domain", "task_id", "url").orderBy(
        F.when(F.col("strategy") == "CRAWLING", 0).otherwise(1).asc(), F.col("pos").asc()
    )
    picked = (
        c.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "pos")
    ).select(
        "url",
        F.when(F.col("strategy") == "CRAWLING", 1).otherwise(0).alias("priority"),
        "scan_domain",
        "actions",
        "task_id",
    )
    return _with_seq(picked, ["scan_domain", "task_id", "url"])


def _with_seq(df: DataFrame, order_keys: list[str]) -> DataFrame:
    """Assign seq = 1-based global rank by ``order_keys`` WITHOUT funnelling
    the whole frame through one window partition (VERDICT r2 #7: the old
    ``row_number().over(Window.orderBy(...))`` serialized a 10^8-candidate
    ingest into a single task).

    Distributed form: range-repartition + in-partition sort gives a total
    order across partitions; per-partition row counts (one tiny collect of
    #partitions integers) become cumulative offsets; an Arrow-batched
    mapInPandas adds offset + local index. seq depends only on the rank in
    the total key order (keys are unique after the dedup pick), so the
    output is identical to the single-window form at any parallelism.
    localCheckpoint pins the range boundaries so the count pass and the
    assignment pass see the same partitioning.
    """
    from pyspark import TaskContext

    ordered = (
        df.repartitionByRange(*order_keys)
        .sortWithinPartitions(*order_keys)
        .localCheckpoint(eager=True)
    )
    counts = dict(
        (r["pid"], r["count"])
        for r in ordered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    offsets, acc = {}, 0
    for pid in range(ordered.rdd.getNumPartitions()):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    out_schema = "seq long, " + ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in ordered.schema.fields
    )
    cols = [f.name for f in ordered.schema.fields]

    def assign(batches):
        nxt = offsets[TaskContext.get().partitionId()]
        for pdf in batches:
            pdf = pdf.copy()
            pdf.insert(0, "seq", range(nxt + 1, nxt + 1 + len(pdf)))
            pdf["seq"] = pdf["seq"].astype("int64")
            nxt += len(pdf)
            yield pdf

    return ordered.mapInPandas(assign, out_schema).select("seq", *cols)
