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


_IVF_CENTROID_IDS = (1, 2, 3, 4)  # "pretrained" coarse quantizer rows
_IVF_NPROBE = 2


@q(
    "embedding_ivf_topk",
    f"""
    WITH qv AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}),
    c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings
          WHERE vec_id IN {_IVF_CENTROID_IDS}),
    assign AS (
      SELECT v.vec_id, v.embedding::DOUBLE[] AS ve, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_dot_product(v.embedding::DOUBLE[], c.ce)
                        / (sqrt(list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[]))
                           * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cid ASC) AS rn
      FROM embeddings v CROSS JOIN c
      WHERE v.vec_id != {_QUERY_VEC_ID}),
    a AS (SELECT vec_id, ve, cid FROM assign WHERE rn = 1),
    probe AS (
      SELECT cid FROM c, qv
      ORDER BY list_dot_product(c.ce, qv.e)
               / (sqrt(list_dot_product(c.ce, c.ce)) * sqrt(list_dot_product(qv.e, qv.e)))
               DESC, cid ASC
      LIMIT {_IVF_NPROBE})
    SELECT a.vec_id, a.cid AS cluster,
           ROUND(list_dot_product(a.ve, qv.e)
                 / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(qv.e, qv.e))),
                 6) AS cosine
    FROM a, qv
    WHERE a.cid IN (SELECT cid FROM probe)
    ORDER BY cosine DESC, a.vec_id ASC
    LIMIT 10
    """,
    "ANN scale path #2, IVF: assign every vector to its nearest coarse centroid (broadcast 4-row cross join + per-vector rank), probe the nprobe clusters closest to the query, brute-force only inside them; centroids are fixed table rows so the oracle replays assignment bit-for-bit",
)
def embedding_ivf_topk(spark, sf_dir):
    from pyspark.sql import Window

    qv = _query_vec(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id").isin(*_IVF_CENTROID_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    # probe clusters: nearest centroids to the query, picked driver-side from
    # the 4 collected centroid rows (the IVF coarse-search step)
    import math

    cent_rows = cents.collect()
    qn = math.sqrt(sum(x * x for x in qv))

    def cosq(vec):
        vv = [float(x) for x in vec]
        return sum(a * b for a, b in zip(vv, qv)) / (math.sqrt(sum(x * x for x in vv)) * qn)

    probe = [
        r["cid"]
        for r in sorted(cent_rows, key=lambda r: (-cosq(r["ce"]), r["cid"]))[:_IVF_NPROBE]
    ]

    crossed = emb.filter(F.col("vec_id") != _QUERY_VEC_ID).crossJoin(F.broadcast(cents))
    cos_vc = _dot(F.col("embedding"), F.col("ce")) / (
        _norm(F.col("embedding")) * _norm(F.col("ce"))
    )
    w = Window.partitionBy("vec_id").orderBy(cos_vc.desc(), F.col("cid").asc())
    assign = (
        crossed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )
    sel = assign.filter(F.col("cid").isin(*probe))
    return (
        cosine_to_query(sel, qv)
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.col("cid").alias("cluster"), "cosine")
    )


@q(
    "embedding_lsh_neardup_pairs",
    f"""
    WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                      {_BUCKET_SQL.format(v='embedding')} AS bkt
               FROM embeddings)
    SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b, a.bkt AS bucket,
           ROUND(list_dot_product(a.e, b2.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b2.e, b2.e))), 6) AS cosine
    FROM b a JOIN b b2 ON a.bkt = b2.bkt AND a.vec_id < b2.vec_id
    WHERE list_dot_product(a.e, b2.e)
          / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b2.e, b2.e)))
          >= 0.30
    """,
    "embedding near-dup, LSH-bucketed: sign-projection buckets bound the pair join to ~n^2/2^bits (no label crutch) — the all-pairs scale path of embedding_neardup_pairs",
)
def embedding_lsh_neardup_pairs(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "bkt", _bucket_expr_spark(F.col("embedding"))
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("bkt"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("bkt"), F.col("embedding").alias("eb"))
    pairs = a.join(b, "bkt").filter(F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        pairs.withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.30)
        .select(
            "vec_a", "vec_b", F.col("bkt").alias("bucket"), F.round("cos_raw", 6).alias("cosine")
        )
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
