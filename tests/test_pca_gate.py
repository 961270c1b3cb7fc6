"""embedding_pca_project correctness gates.

The query carries no driver oracle (floats through an eigensolver: the
Gramian reduce and eigh are reproducible only to last-ulp, so a value hash
would flap). Its gates are:

1. a numpy replica of the whole fit — same moments, same covariance, same
   canonical sign rule (largest-|coordinate| entry positive) — compared
   within float tolerance, with an explicit eigengap floor proving
   component ORDER and SIGN cannot flip inside that tolerance;
2. a planted-structure semantics test: data whose variance is dominated by
   one known coordinate must come back with pc1 tracking that coordinate
   (|corr| > 0.999) and evr1 capturing the planted share.
"""

import os

import numpy as np
import pandas as pd

from visiblev8_crawler_spark.plans.annops import _PCA_K, embedding_pca_project
from visiblev8_crawler_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.01"


def _replica(X):
    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:_PCA_K]
    comps = []
    for i in order:
        c = v[:, i]
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        comps.append(c)
    evr = [float(w[i] / w.sum()) for i in order]
    gaps = np.sort(w)[::-1]
    return mean, comps, evr, (gaps[: _PCA_K + 1] - gaps[1 : _PCA_K + 2]) / w.sum()


def test_pca_matches_numpy_replica(spark):
    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    mean, comps, evr, gaps = _replica(X)
    # eigengap floor: order/sign stable under last-ulp reduce differences
    assert min(gaps[:_PCA_K]) > 1e-5, gaps
    want = {
        int(vid): tuple(float((x - mean) @ c) for c in comps)
        for vid, x in zip(pdf["vec_id"], X)
    }
    rows = QUERIES["embedding_pca_project"].spark(spark, SF_DIR).collect()
    assert len(rows) == len(want)
    worst = max(
        max(abs(r["pc1"] - want[r["vec_id"]][0]), abs(r["pc2"] - want[r["vec_id"]][1]))
        for r in rows
    )
    assert worst < 1e-5, worst  # 5e-7 rounding quantum + reduce-order slack
    assert abs(rows[0]["evr1"] - evr[0]) < 1e-4  # evr rounded to 4 in the plan
    assert abs(rows[0]["evr2"] - evr[1]) < 1e-4
    # constant columns really are constant
    assert len({(r["evr1"], r["evr2"]) for r in rows}) == 1


def test_pca_planted_dominant_direction(spark, tmp_path_factory):
    """Variance planted on coordinate 0 (sigma 10) vs noise (sigma 0.1)
    everywhere else: pc1 must track coordinate 0 nearly perfectly."""
    d = str(tmp_path_factory.mktemp("pcaemb"))
    rng = np.random.RandomState(7)
    n, dim = 400, 16
    X = rng.normal(0, 0.1, size=(n, dim))
    X[:, 0] = rng.normal(0, 10.0, size=n)
    spark.createDataFrame(
        [(i, [float(x) for x in X[i]], int(i % 3)) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    rows = embedding_pca_project(spark, d).collect()
    by_id = {r["vec_id"]: r for r in rows}
    x0 = np.array([float(np.float32(X[i, 0])) for i in range(n)])  # parquet stores float32
    pc1 = np.array([by_id[i]["pc1"] for i in range(n)])
    corr = np.corrcoef(x0, pc1)[0, 1]
    assert abs(corr) > 0.999, corr
    assert rows[0]["evr1"] > 0.9, rows[0]["evr1"]
