"""Sequence packing for training-data assembly: lay documents end-to-end
in deterministic doc_id order and cut fixed-token-budget training
sequences, WITHOUT funnelling the corpus through a single window
partition. This is the operators/candidates.py `_with_seq` distributed
prefix-sum pattern (VERDICT r2 #7) generalized from row counts to token
sums: range-repartition + in-partition sort pins a total order, the
per-partition token subtotals (one #partitions-sized collect) become
cumulative offsets, and an Arrow-batched mapInPandas emits each doc's
exclusive running token count — identical to the single-window form at
any parallelism, which the oracle replica proves.

The reference has no packing analog (its unit of work is a URL, not a
token budget); this is part of the LLM-pipeline surface the rebuild adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .queries import load, q

_PACK_CAPACITY = 512

# Born pytest-oracled (rotation policy, __spark_entry__.py). The oracle
# spells the SPEC — a global ordered window cumsum — while the Spark plan
# must reach the same numbers via the distributed two-phase form.
_PACK_ORACLE_SQL = f"""
    WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS cum_excl
          FROM t)
    SELECT doc_id, n_tokens,
           cum_excl // {_PACK_CAPACITY} AS seq_id,
           cum_excl % {_PACK_CAPACITY} AS seq_offset
    FROM c ORDER BY doc_id
"""


def _with_token_prefix_sum(df: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, cum_excl) with cum_excl = exclusive running sum
    of n_tokens in global doc_id order, computed distributed."""
    from pyspark import TaskContext

    ordered = (
        df.repartitionByRange("doc_id")
        .sortWithinPartitions("doc_id")
        .localCheckpoint(eager=True)
    )
    subtotals = dict(
        (r["pid"], r["toks"])
        for r in ordered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    )
    offsets, acc = {}, 0
    for pid in range(ordered.rdd.getNumPartitions()):
        offsets[pid] = acc
        acc += int(subtotals.get(pid, 0))

    def assign(batches):
        nxt = offsets[TaskContext.get().partitionId()]
        for pdf in batches:
            pdf = pdf.copy()
            ends = pdf["n_tokens"].cumsum() + nxt
            pdf["cum_excl"] = (ends - pdf["n_tokens"]).astype("int64")
            nxt = int(ends.iloc[-1]) if len(pdf) else nxt
            yield pdf

    return ordered.mapInPandas(assign, "doc_id long, n_tokens long, cum_excl long")


@q(
    "doc_pack_sequences",
    None,  # pytest-oracled via _PACK_ORACLE_SQL (newborn-oracle queue)
    "Training-sequence packing: documents laid end-to-end in doc_id "
    f"order, cut into {_PACK_CAPACITY}-token sequences (overflow-allowed "
    "greedy packing: a doc belongs to the sequence where it starts, "
    "seq_offset says where). The global ordered cumsum is NOT a "
    "single-partition window — range-repartition + per-partition token "
    "subtotals + Arrow-batched offset assignment, the same distributed "
    "prefix-sum the candidate seq assignment uses, so packing a 10^9-doc "
    "corpus parallelizes while staying bit-identical to the window SPEC.",
)
def doc_pack_sequences(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    c = _with_token_prefix_sum(d)
    return c.select(
        "doc_id",
        "n_tokens",
        # `div` is exact BIGINT division (no double round-trip — the same
        # integer-math discipline as the incremental cursor)
        F.expr(f"cum_excl div {_PACK_CAPACITY}").alias("seq_id"),
        F.pmod("cum_excl", F.lit(_PACK_CAPACITY)).cast("long").alias("seq_offset"),
    ).orderBy("doc_id")
