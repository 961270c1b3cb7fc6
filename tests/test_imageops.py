"""Multimodal image ops (plans/imageops.py): the rows-only queries are
exact-checked here against a pure-Python mirror (decode is not
SQL-expressible, so the DuckDB gate only row-counts them; this is the real
correctness check)."""

import hashlib

import pandas as pd
import pytest

from visiblev8_crawler_spark import codecs
from visiblev8_crawler_spark.plans import imageops

SF_DIR = "/root/testdata/sf0.001"


def _expected_rows():
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")["doc_id"]
    out = {}
    for doc_id in docs:
        md5 = hashlib.md5(str(int(doc_id)).encode()).hexdigest()
        w = 16 + (ord(md5[0]) % 3) * 8
        h = 16 + (ord(md5[1]) % 3) * 8
        px = codecs.pixels_for(f"doc_{int(doc_id)}", w, h)
        out[int(doc_id)] = (w, h, px)
    return out


@pytest.fixture(scope="module")
def expected():
    return _expected_rows()


def test_decode_dims_roundtrip(spark, expected):
    got = {r["doc_id"]: (r["w"], r["h"]) for r in imageops.image_decode_dims(spark, SF_DIR).collect()}
    assert got == {k: (w, h) for k, (w, h, _px) in expected.items()}


def test_feature_stats_match_mirror(spark, expected):
    got = {
        r["doc_id"]: (r["mean_r"], r["mean_g"], r["mean_b"], r["phash"])
        for r in imageops.image_feature_stats(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for doc_id, (_w, _h, px) in expected.items():
        m = px.reshape(-1, 3).mean(axis=0)
        want = (int(m[0]), int(m[1]), int(m[2]), codecs.phash64(px))
        assert got[doc_id] == want, doc_id


def test_resize_fp_match_mirror(spark, expected):
    got = {r["doc_id"]: r["thumb_fp"] for r in imageops.image_resize_fp(spark, SF_DIR).collect()}
    for doc_id, (_w, _h, px) in expected.items():
        want = hashlib.md5(imageops.resize_nn(px).tobytes()).hexdigest()
        assert got[doc_id] == want, doc_id


def test_video_frame_sample(spark):
    got = {}
    for r in imageops.video_frame_sample(spark, SF_DIR).collect():
        got[(r["doc_id"], r["frame_idx"])] = (r["mean_lum"], r["phash"])

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")["doc_id"]
    want = {}
    for doc_id in docs:
        blob = imageops._video_for(int(doc_id))
        for k, frame in enumerate(imageops.iter_vseq_frames(blob)):
            if k % 2:
                continue
            want[(int(doc_id), k)] = (int(frame.mean()), codecs.phash64(frame))
    assert got == want
    # sampling really skipped frames: indices are 0,2,4 of a 6-frame clip
    assert {k for _d, k in got} == {0, 2, 4}


def test_vseq_rejects_garbage():
    with pytest.raises(ValueError):
        list(imageops.iter_vseq_frames(b"nope"))


def test_av_stub_raises():
    with pytest.raises(NotImplementedError):
        imageops.decode_av_stub(b"\x00", "mp4")


def test_audio_frame_features_match_golden(spark):
    """Distributed Arrow execution == single-process golden on every row
    (same proof mechanism as the image/video goldens; the feature kernel
    is SHARED between the Spark op and the generator, so a drift is
    impossible by construction and this test pins the plumbing: binary
    column across the Arrow boundary, flatMap fan-out, schema)."""
    import duckdb

    from visiblev8_crawler_spark.plans.imageops import _AUDIO_ORACLE_SQL

    got = sorted(
        (r["doc_id"], r["frame_idx"], r["rms"], r["zcr"])
        for r in imageops.audio_frame_features(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(_AUDIO_ORACLE_SQL).fetchall())
    assert len(got) > 0
    assert got == want
    # framing arithmetic: 4096 samples, frame 512, hop 256 -> 15 frames/doc
    n_docs = len({d for d, _, _, _ in got})
    assert len(got) == 15 * n_docs


def test_audio_blob_container_roundtrip():
    """The PCM1 container decodes to exactly what was encoded, and the
    kernel rejects a foreign blob instead of mis-parsing it."""
    import numpy as np
    import pytest

    from visiblev8_crawler_spark.plans.imageops import (
        _AUDIO_MAGIC,
        _audio_for,
        audio_features_from_blob,
    )

    blob = _audio_for(7)
    assert blob[:4] == _AUDIO_MAGIC
    n = int.from_bytes(blob[4:8], "little")
    assert n == 4096 and len(blob) == 8 + 2 * n
    feats = audio_features_from_blob(blob)
    assert [f[0] for f in feats] == list(range(15))
    assert all(f[1] > 0 for f in feats)  # sine+noise has energy
    # determinism: same doc_id -> identical blob and features
    assert _audio_for(7) == blob and audio_features_from_blob(_audio_for(7)) == feats
    with pytest.raises(ValueError):
        audio_features_from_blob(b"RIFF" + bytes(16))
