"""ANN index-quality gates (VERDICT r3 #6): the recall numbers the
ann_recall_report measures become CI floors, so a parameter change that
silently craters index quality (say r=4 -> r=12, emptying every bucket)
fails here instead of shipping.

Floors sit under the deterministic measured values on the sf0.01 fixture
corpus (synthetic embeddings + fixed query panel — no randomness):
  - single-bucket sign-LSH top-10 (ann_recall_report): mean 0.167
  - banded 4x4 near-dup pair recall vs exact tau=0.30 pairs: 0.474
  - banded 8x6 (high-precision parameterization):           0.333
The absolute levels are what one hash table with one probe buys on
64-dim synthetic vectors at tau=0.30 — the documented upgrade path
(annops.py, parameter-choice site) is multiprobe / more bands, measured
by this same report before trusting any swap.
"""

import pyspark.sql.functions as F

from visiblev8_crawler_spark.plans.annops import _banded_neardup_spark, _dot, _norm
from visiblev8_crawler_spark.plans.queries import QUERIES, load

SF_DIR = "/root/testdata/sf0.01"


def _exact_tau_pairs(spark, tau=0.30):
    ev = load(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    a = ev.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = ev.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= tau)
        .select("vec_a", "vec_b")
    )


def test_lsh_topk_recall_floor(spark):
    rep = QUERIES["ann_recall_report"].spark(spark, SF_DIR).collect()
    recs = [r["recall_at_10"] for r in rep]
    mean = sum(recs) / len(recs)
    assert mean >= 0.10, f"mean recall@10 {mean:.3f} (panel {sorted(recs)})"


def test_banded_neardup_recall_floors(spark):
    exact = _exact_tau_pairs(spark).localCheckpoint(eager=True)
    n_exact = exact.count()
    assert n_exact > 0
    for bands, r, floor in ((4, 4, 0.40), (8, 6, 0.25)):
        got = _banded_neardup_spark(spark, SF_DIR, bands=bands, r=r, tau=0.30).select(
            "vec_a", "vec_b"
        )
        hit = got.join(exact, ["vec_a", "vec_b"], "left_semi").count()
        recall = hit / n_exact
        assert recall >= floor, f"b={bands} r={r}: recall {recall:.3f} < {floor}"
