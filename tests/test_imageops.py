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
