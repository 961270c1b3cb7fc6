"""Generate a LOCAL measurement dataset at an arbitrary scale multiple of
sf0.1 (default 10x ~= the driver's sf1.0), written to a target directory
(default /tmp/sfbench1.0). Used ONLY for optimization-round measurement —
never for correctness gates (those run on the read-only driver testdata).

Distributions are bootstrapped from /root/testdata/sf0.1 so plan shapes and
selectivities match: categorical columns resample the empirical
distribution, keys are re-drawn over the scaled key spaces, documents are
regenerated from the same 31-word vocabulary with the same 10-100 token
lengths, embeddings are iid N(0, 0.125) float32 (the fixture's fit), events
keep the 30-day span with 10x density.

Usage: python tools/gen_scale_data.py [--mult 10] [--out /tmp/sfbench1.0]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"


def _read(name):
    return pq.read_table(f"{BASE}/{name}.parquet")


def _write(out, name, table):
    # pyarrow default row-group sizing (1Mi rows): matches the fixture
    # layout (every sf<=0.1 table is one row group, exactly as observed in
    # /root/testdata), so big tables split the way the driver's generator
    # would split them and scan parallelism in the bench mirrors reality
    pq.write_table(table, f"{out}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def _boot(rng, table, n, drop=()):
    """Bootstrap-resample n rows of a pyarrow table (as pandas)."""
    df = table.to_pandas()
    idx = rng.integers(0, len(df), size=n)
    out = df.iloc[idx].reset_index(drop=True)
    return out.drop(columns=list(drop))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=float, default=10.0)
    ap.add_argument("--out", default="/tmp/sfbench1.0")
    args = ap.parse_args()
    m = args.mult
    out = args.out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260822)

    # dimensions copied verbatim
    for name in ("region", "nation"):
        _write(out, name, _read(name))

    n_cust = int(15000 * m)
    n_supp = int(1000 * m)
    n_part = int(20000 * m)
    n_ord = int(150000 * m)
    n_li = int(600000 * m)
    n_docs = int(5000 * m)
    n_emb = int(2000 * m)
    n_ev = int(100000 * m)
    n_users = int(1500 * m)

    # customer
    c = _boot(rng, _read("customer"), n_cust)
    c["c_custkey"] = np.arange(n_cust, dtype=np.int64)
    c["c_name"] = [f"Customer#{k:09d}" for k in range(n_cust)]
    _write(out, "customer", pa.Table.from_pandas(c, preserve_index=False))

    s = _boot(rng, _read("supplier"), n_supp)
    s["s_suppkey"] = np.arange(n_supp, dtype=np.int64)
    s["s_name"] = [f"Supplier#{k:09d}" for k in range(n_supp)]
    _write(out, "supplier", pa.Table.from_pandas(s, preserve_index=False))

    p = _boot(rng, _read("part"), n_part)
    p["p_partkey"] = np.arange(n_part, dtype=np.int64)
    _write(out, "part", pa.Table.from_pandas(p, preserve_index=False))

    o = _boot(rng, _read("orders"), n_ord)
    o["o_orderkey"] = np.arange(n_ord, dtype=np.int64)
    o["o_custkey"] = rng.integers(0, n_cust, size=n_ord)
    _write(out, "orders", pa.Table.from_pandas(o, preserve_index=False))

    li = _boot(rng, _read("lineitem"), n_li)
    li["l_orderkey"] = rng.integers(0, n_ord, size=n_li)
    li["l_partkey"] = rng.integers(0, n_part, size=n_li)
    li["l_suppkey"] = rng.integers(0, n_supp, size=n_li)
    _write(out, "lineitem", pa.Table.from_pandas(li, preserve_index=False))

    # documents: regenerate from the fixture vocabulary; keep ~0.2% exact dups
    src_docs = _read("documents").to_pandas()
    vocab = np.array(sorted({t for txt in src_docs.text for t in txt.split(" ")}))
    lens = rng.integers(10, 101, size=n_docs)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), size=ln)]) for ln in lens
    ]
    dup_n = max(1, n_docs // 500)
    for k in range(dup_n):  # planted exact duplicates (dedup ops need them)
        texts[rng.integers(0, n_docs)] = texts[rng.integers(0, n_docs)]
    langs = src_docs.lang.to_numpy()[rng.integers(0, len(src_docs), size=n_docs)]
    n_sources = src_docs.source.nunique()
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array([f"src{i % n_sources}" for i in range(n_docs)]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    _write(out, "documents", docs)

    # embeddings: iid N(0, 0.125) float32, dim 64; ~1% planted near-dups
    X = rng.normal(0.0, 0.125, size=(n_emb, 64)).astype(np.float32)
    ndup = n_emb // 100
    for k in range(ndup):
        i, j = rng.integers(0, n_emb, size=2)
        X[i] = X[j] + rng.normal(0, 0.005, size=64).astype(np.float32)
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
            "embedding": pa.array(list(X), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n_emb)),
        }
    )
    _write(out, "embeddings", emb)

    # events: same 30-day span, 10x density, 10x users
    span_us = 30 * 24 * 3600 * 1_000_000
    base_us = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = np.sort(rng.integers(0, span_us, size=n_ev)) + base_us
    types = np.array(["view", "click", "purchase", "signup", "error"])
    ev = pa.table(
        {
            "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, n_users, size=n_ev)),
            "event_type": pa.array(types[rng.integers(0, 5, size=n_ev)]),
            "value": pa.array(np.round(rng.uniform(0, 560, size=n_ev), 2)),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n_ev)]
            ),
        }
    )
    _write(out, "events", ev)
    print("done:", out)


if __name__ == "__main__":
    main()
