"""embedding_kmeans_train correctness gates.

The query carries no driver oracle (floats through an iterative fixpoint:
avg() partial-combine order makes centroid coordinates reproducible only to
last-ulp, so a value hash would flap). Its gates are:

1. a sequential-fold pure-Python replica of the whole Lloyd loop — same
   seed rows, same tie rule, same summation ORDER as the Spark plan's
   zip_with/aggregate dot product — compared within float tolerance, with
   an explicit argmax-margin guard proving no assignment can flip inside
   that tolerance;
2. a planted-blob semantics test: four tight orthogonal blobs must come
   back as four clusters with near-1 mean cosine, and the exact early-stop
   (assignments frozen -> centroid shift at ulp scale) must fire before
   the round budget.
"""

import math
import os
import tempfile

import duckdb
import pytest

from visiblev8_crawler_spark.plans.annops import (
    _KMEANS_K_IDS,
    _KMEANS_MAX_ROUNDS,
    embedding_kmeans_train,
)
from visiblev8_crawler_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.01"


def _replica(rows, k_ids, max_rounds):
    """Pure-Python spherical k-means, sequential summation order."""

    def unit(v):
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    vecs = {vid: unit([float(x) for x in e]) for vid, e in rows}
    cents = [vecs[i] for i in sorted(k_ids)]
    dim = len(cents[0])

    def assign(cents):
        out = {}
        margins = []
        for vid, ue in vecs.items():
            cos = [sum(a * b for a, b in zip(ue, ce)) for ce in cents]
            order = sorted(range(len(cents)), key=lambda ci: (-cos[ci], ci))
            out[vid] = order[0]
            margins.append(cos[order[0]] - cos[order[1]])
        return out, min(margins)

    rounds = 0
    min_margin = float("inf")
    for _ in range(max_rounds):
        rounds += 1
        a, margin = assign(cents)
        min_margin = min(min_margin, margin)
        sums = {}
        counts = {}
        for vid in sorted(vecs):  # deterministic order
            ci = a[vid]
            counts[ci] = counts.get(ci, 0) + 1
            s = sums.setdefault(ci, [0.0] * dim)
            for d in range(dim):
                s[d] += vecs[vid][d]
        new_cents = list(cents)
        for ci, s in sums.items():
            new_cents[ci] = unit([x / counts[ci] for x in s])
        shift = max(
            abs(x - y) for nc, oc in zip(new_cents, cents) for x, y in zip(nc, oc)
        )
        cents = new_cents
        if shift < 1e-9:
            break
    final, margin = assign(cents)
    min_margin = min(min_margin, margin)
    return cents, final, rounds, min_margin


def test_kmeans_python_replica(spark):
    got = {r["cluster"]: r for r in QUERIES["embedding_kmeans_train"].spark(spark, SF_DIR).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    cents, assign, rounds, margin = _replica(rows, _KMEANS_K_IDS, _KMEANS_MAX_ROUNDS)
    # no vector sits within float-noise of a cluster boundary in ANY round,
    # so Spark's (ulp-different) sums cannot produce different assignments
    assert margin > 1e-9
    sizes = {}
    for ci in assign.values():
        sizes[ci] = sizes.get(ci, 0) + 1
    assert set(got) == set(range(len(_KMEANS_K_IDS)))
    for ci, row in got.items():
        assert row["n_members"] == sizes[ci]
        assert row["rounds"] == rounds
        for a, b in zip(row["centroid"], cents[ci]):
            assert abs(a - b) < 2e-6  # output rounded to 6 decimals
    # mean_cos: recompute from the replica
    vecs = {
        vid: [float(x) for x in e] for vid, e in rows
    }
    for ci, row in got.items():
        members = [v for v, c in assign.items() if c == ci]
        mc = 0.0
        for vid in members:
            ue = vecs[vid]
            n = math.sqrt(sum(x * x for x in ue))
            mc += sum(a * b / n for a, b in zip(ue, cents[ci]))
        mc /= len(members)
        assert abs(row["mean_cos"] - mc) < 2e-4


def test_kmeans_planted_blobs(spark):
    """Four tight blobs around orthogonal axes -> four clean clusters,
    early exact stop before the round budget."""
    dim = 8

    def blob_vec(axis, j):
        v = [0.0] * dim
        v[axis] = 1.0
        v[(axis + 4) % dim] = 0.05 * (j + 1)  # small in-blob spread
        return v

    # seed convention: the trainer seeds from vec_ids 1..4 — place one
    # blob anchor at each seed id, then the remaining 9 per blob after
    rows = [(axis + 1, blob_vec(axis, 0), axis) for axis in range(4)]
    vid = 5
    for axis in range(4):
        for j in range(1, 10):
            rows.append((vid, blob_vec(axis, j), axis))
            vid += 1
    d = tempfile.mkdtemp(prefix="kmeans_")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    out = {r["cluster"]: r for r in embedding_kmeans_train(spark, d).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert [out[c]["n_members"] for c in range(4)] == [10, 10, 10, 10]
    # orthogonal blobs: cohesion near 1, and assignments freeze well
    # before the round budget so the exact early-stop path fires
    assert all(r["mean_cos"] > 0.99 for r in out.values())
    assert all(r["rounds"] < _KMEANS_MAX_ROUNDS for r in out.values())
    # each cluster's centroid points along its blob axis
    for axis in range(4):
        c = out[axis]["centroid"]
        assert c[axis] > 0.95
        assert pytest.approx(1.0, abs=1e-6) == sum(x * x for x in c)
