"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths, as a 100 TB pipeline needs both:
- brute-force cosine top-k (the exactness baseline) — one pass, JVM-side
  higher-order functions (zip_with + aggregate), no Python;
- LSH-bucketed top-k (the scale path) — deterministic sign-projection
  buckets prune the scan to ~1/2^3 of rows before scoring; the bucket
  expression is plan-level, so at scale it becomes a partition/file-prune
  on a bucket-partitioned table instead of a full scan.

All float math is double-precision in both engines (DuckDB lists are cast
to DOUBLE[]), summed in the same element order, and rounded before output
so the oracle value-hash is stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import load, q

_QUERY_VEC_ID = 0
_DIM = 64


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_to_query(df: DataFrame, qv: list[float]) -> DataFrame:
    lit_q = F.array(*[F.lit(x) for x in qv])
    return df.withColumn(
        "cosine",
        F.round(
            _dot(F.col("embedding"), lit_q) / (_norm(F.col("embedding")) * F.lit(sum(x * x for x in qv) ** 0.5)),
            6,
        ),
    )


_COS_SQL = """
    WITH qv AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = {qid})
    SELECT v.vec_id, v.label,
           ROUND(list_dot_product(v.embedding::DOUBLE[], qv.e)
                 / (sqrt(list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(qv.e, qv.e))), 6) AS cosine
    FROM embeddings v, qv
    WHERE v.vec_id != {qid}
"""


@q(
    "embedding_cosine_topk",
    _COS_SQL.format(qid=_QUERY_VEC_ID)
    + " ORDER BY cosine DESC, v.vec_id ASC LIMIT 10",
    "ANN baseline: brute-force cosine top-k via zip_with/aggregate HOFs (TakeOrderedAndProject, no full sort)",
)
def embedding_cosine_topk(spark, sf_dir):
    qv = _query_vec(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") != _QUERY_VEC_ID)
    return (
        cosine_to_query(emb, qv)
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", "cosine")
    )


def _bucket_expr_spark(col: Column) -> Column:
    """3-bit deterministic sign-projection bucket (axes 1, 8, 22, 1-based)."""
    b = (
        F.when(F.element_at(col, 1) > 0, 4).otherwise(0)
        + F.when(F.element_at(col, 8) > 0, 2).otherwise(0)
        + F.when(F.element_at(col, 22) > 0, 1).otherwise(0)
    )
    return b


_BUCKET_SQL = (
    "(CASE WHEN {v}[1] > 0 THEN 4 ELSE 0 END + CASE WHEN {v}[8] > 0 THEN 2 ELSE 0 END"
    " + CASE WHEN {v}[22] > 0 THEN 1 ELSE 0 END)"
)


@q(
    "embedding_lsh_topk",
    _COS_SQL.format(qid=_QUERY_VEC_ID)
    + f" AND {_BUCKET_SQL.format(v='v.embedding')} = (SELECT {_BUCKET_SQL.format(v='e')} FROM qv)"
    + " ORDER BY cosine DESC, v.vec_id ASC LIMIT 10",
    "ANN scale path: sign-projection LSH bucket prunes candidates before scoring; on a bucket-partitioned table this is partition pruning, not a scan",
)
def embedding_lsh_topk(spark, sf_dir):
    qv = _query_vec(spark, sf_dir)
    qbucket = (4 if qv[0] > 0 else 0) + (2 if qv[7] > 0 else 0) + (1 if qv[21] > 0 else 0)
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") != _QUERY_VEC_ID)
    pruned = emb.filter(_bucket_expr_spark(F.col("embedding")) == qbucket)
    return (
        cosine_to_query(pruned, qv)
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", "cosine")
    )


@q(
    "embedding_neardup_pairs",
    """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 6) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.30
    """,
    "embedding near-dup: label-bucketed pair join (the bucket key bounds the quadratic blowup; cross-bucket pairs are out of scope by construction)",
)
def embedding_neardup_pairs(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, "label").filter(F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        pairs.withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.30)
        .select("vec_a", "vec_b", "label", F.round("cos_raw", 6).alias("cosine"))
    )
