"""Generate golden tables for the image/video operators.

The multimodal kernels (plans/imageops.py) are pure functions of doc_id:
pixels, PNG bytes, thumbnails and video frames all derive from
codecs.pixels_for(f"doc_{doc_id}", w, h) with md5-derived dims. Decode is
not SQL-expressible, so the DuckDB oracle for these ops is a *golden
table*: this script computes the expected outputs single-process with the
pure-Python mirrors and writes them to goldens/*.parquet; the oracle SQL
joins the golden on documents.doc_id. A driver hash match then proves the
distributed, Arrow-batched mapInPandas execution reproduces the
single-process reference bit-for-bit on every row (VERDICT round 1, item 6).

Covers doc_id 0..4999 — a superset of documents.doc_id at every test scale
factor (sf0.001/sf0.01: 0..499; sf0.1: 0..4999), so one golden serves all;
the join restricts to the scale factor under test.

Rerun after any codec/kernel change:  python tools/gen_image_goldens.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from visiblev8_crawler_spark import codecs  # noqa: E402
from visiblev8_crawler_spark.plans.imageops import (  # noqa: E402
    _audio_for,
    _video_for,
    audio_features_from_blob,
    iter_vseq_frames,
    resize_nn,
)

N_DOCS = 5000
STRIDE = 2  # video_frame_sample default


def dim(doc_id: int, pos: int) -> int:
    # mirror of plans/imageops._dim_col / _DIMS_SQL
    return 16 + (ord(hashlib.md5(str(doc_id).encode()).hexdigest()[pos - 1]) % 3) * 8


def main() -> None:
    out_dir = os.path.join(os.path.dirname(__file__), "..", "goldens")
    os.makedirs(out_dir, exist_ok=True)

    stats = {"doc_id": [], "mean_r": [], "mean_g": [], "mean_b": [], "phash": []}
    fps = {"doc_id": [], "thumb_fp": []}
    frames = {"doc_id": [], "frame_idx": [], "mean_lum": [], "phash": []}
    audio = {"doc_id": [], "frame_idx": [], "rms": [], "zcr": []}

    for doc_id in range(N_DOCS):
        arr = codecs.pixels_for(f"doc_{doc_id}", dim(doc_id, 1), dim(doc_id, 2))
        m = arr.reshape(-1, 3).mean(axis=0)
        stats["doc_id"].append(doc_id)
        stats["mean_r"].append(int(m[0]))
        stats["mean_g"].append(int(m[1]))
        stats["mean_b"].append(int(m[2]))
        stats["phash"].append(codecs.phash64(arr))

        fps["doc_id"].append(doc_id)
        fps["thumb_fp"].append(hashlib.md5(resize_nn(arr).tobytes()).hexdigest())

        for k, frame in enumerate(iter_vseq_frames(_video_for(doc_id))):
            if k % STRIDE:
                continue
            frames["doc_id"].append(doc_id)
            frames["frame_idx"].append(k)
            frames["mean_lum"].append(int(frame.mean()))
            frames["phash"].append(codecs.phash64(frame))

        for k, rms, zcr in audio_features_from_blob(_audio_for(doc_id)):
            audio["doc_id"].append(doc_id)
            audio["frame_idx"].append(k)
            audio["rms"].append(rms)
            audio["zcr"].append(zcr)

    pq.write_table(
        pa.table(stats).cast(
            pa.schema(
                [("doc_id", pa.int64()), ("mean_r", pa.int32()), ("mean_g", pa.int32()),
                 ("mean_b", pa.int32()), ("phash", pa.int64())]
            )
        ),
        os.path.join(out_dir, "image_stats.parquet"),
    )
    pq.write_table(
        pa.table(fps).cast(pa.schema([("doc_id", pa.int64()), ("thumb_fp", pa.string())])),
        os.path.join(out_dir, "image_resize_fp.parquet"),
    )
    pq.write_table(
        pa.table(frames).cast(
            pa.schema(
                [("doc_id", pa.int64()), ("frame_idx", pa.int32()),
                 ("mean_lum", pa.int32()), ("phash", pa.int64())]
            )
        ),
        os.path.join(out_dir, "video_frames.parquet"),
    )
    pq.write_table(
        pa.table(audio).cast(
            pa.schema(
                [("doc_id", pa.int64()), ("frame_idx", pa.int32()),
                 ("rms", pa.float64()), ("zcr", pa.int32())]
            )
        ),
        os.path.join(out_dir, "audio_frames.parquet"),
    )
    print(f"wrote goldens for {N_DOCS} docs to {os.path.abspath(out_dir)}")


if __name__ == "__main__":
    main()
