"""doc_pack_sequences gates: DuckDB replica (the window-cumsum SPEC vs
the distributed prefix-sum plan) + planted boundary-straddling world."""

import os
import tempfile

import duckdb

from visiblev8_crawler_spark.plans.packing import (
    _PACK_CAPACITY,
    _PACK_ORACLE_SQL,
    doc_pack_sequences,
)
from visiblev8_crawler_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.01"


def test_pack_sequences_oracle_replica(spark):
    got = [
        (r["doc_id"], r["n_tokens"], r["seq_id"], r["seq_offset"])
        for r in QUERIES["doc_pack_sequences"].spark(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = [tuple(r) for r in con.execute(_PACK_ORACLE_SQL).fetchall()]
    assert len(got) > 0
    assert got == want
    # the corpus must actually span multiple sequences for this to gate
    assert got[-1][2] > 0


def test_pack_sequences_planted_boundaries(spark):
    """200-token docs against the 512 budget: doc 2 starts at offset 400
    (straddles into the next sequence but belongs where it starts), doc 3
    opens sequence 1 at offset 88."""
    tok = " ".join(["w"] * 200)
    d = tempfile.mkdtemp(prefix="pack_")
    spark.createDataFrame(
        [(i, tok, "en", "web", len(tok)) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = [
        (r["doc_id"], r["seq_id"], r["seq_offset"])
        for r in doc_pack_sequences(spark, d).collect()
    ]
    assert _PACK_CAPACITY == 512
    assert got == [
        (0, 0, 0),
        (1, 0, 200),
        (2, 0, 400),
        (3, 1, 88),
        (4, 1, 288),
    ], got
