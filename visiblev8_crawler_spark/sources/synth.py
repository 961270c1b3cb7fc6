"""Deterministic synthetic world: images / frontier / robots (FIXTURES.md).

Mirrors the reference's inputs with no external data:
- ``images``   — the fetch universe, shape fixed by BASELINE.json input_hint:
                 (image_id, bytes, w, h, fmt, caption, phash). Plays the role
                 of "the web" that vv8_worker's Chromium fetched.
- ``frontier`` — seed list (url_sender.py:52-79 newline files; urls_100k.txt),
                 with the same dirt the reference guards against: blank lines
                 (url_sender.py:72-74), scheme-less urls (url_sender.py:93-101),
                 invalid schemes (backend tasks.py:29-52), exact duplicates
                 (backend tasks.py:151-156), priority rows (eval_banks.py:50-56).
                 Hosts are Zipf-skewed (hot-domain analog of urls_100k.txt).
- ``robots``   — per-host gating + politeness dimension required by the
                 north_rule (absent in the reference; closest analog is the
                 adblock table, 1_postgres_schema.sql:20-25).

Every row is a pure function of its index + generation params, so the
driver-side pandas generator and the distributed Spark generator
(``generate_images_spark``) emit byte-identical tables at any parallelism.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .. import codecs

# corruption buckets, per mille of image ids (deterministic on id hash)
_CORRUPT_TRUNCATED = range(0, 10)  # -> DECODE_ERROR
_CORRUPT_CAPTION = range(10, 20)  # -> CAPTION_MISMATCH
_CORRUPT_DIMS = range(20, 30)  # -> DIM_MISMATCH
_CORRUPT_PHASH = range(30, 40)  # -> PHASH_MISMATCH
_CORRUPT_PIXELS = range(40, 45)  # -> LOW_PSNR

IMAGE_SIZES = (16, 24, 32)


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def image_id_for(i: int) -> str:
    return f"img_{i:012d}"


def image_row(i: int, sizes: tuple[int, ...] = IMAGE_SIZES) -> dict:
    """Pure function index -> images row (plus honest/expected-status extras
    that are *not* written to the table — they exist only for test oracles).
    ``sizes`` scales per-image decode cost (the scaling bench uses larger
    images so the job is compute-bound, the regime a 10^10-row crawl runs in).
    """
    image_id = image_id_for(i)
    hv = _h("img:" + image_id)
    w = sizes[hv % len(sizes)]
    h = sizes[(hv >> 8) % len(sizes)]
    fmt = "png" if (hv >> 16) % 2 == 0 else "jpeg"
    bucket = (hv >> 24) % 1000

    pixels = codecs.pixels_for(image_id, w, h)
    caption = codecs.caption_for(image_id)
    expected = "OK"
    if bucket in _CORRUPT_PIXELS:
        pixels = codecs.pixels_for(image_id + "#corrupt", w, h)
        expected = "LOW_PSNR"
    data = codecs.encode_image(pixels, fmt)
    phash = codecs.phash64(codecs.decode_image(data, fmt))
    decl_w, decl_h = w, h
    if bucket in _CORRUPT_TRUNCATED:
        data = data[: max(8, len(data) // 2)]
        expected = "DECODE_ERROR"
    elif bucket in _CORRUPT_CAPTION:
        caption = caption + " corrupted"
        expected = "CAPTION_MISMATCH"
    elif bucket in _CORRUPT_DIMS:
        decl_w, decl_h = w + 1, h
        expected = "DIM_MISMATCH"
    elif bucket in _CORRUPT_PHASH:
        phash = phash ^ 0x1
        expected = "PHASH_MISMATCH"
    return {
        "image_id": image_id,
        "bytes": data,
        "w": decl_w,
        "h": decl_h,
        "fmt": fmt,
        "caption": caption,
        "phash": phash,
        "_expected_status": expected,
    }


def host_for(i: int, n_hosts: int) -> str:
    """Zipf-ish host pick: log-uniform rank (hot head, long tail)."""
    u = (_h(f"hostpick:{i}") % 10_000_000) / 10_000_000.0
    rank = int(n_hosts**u) - 1
    rank = min(max(rank, 0), n_hosts - 1)
    return f"host{rank}.site{rank % 97}.example"


def frontier_row(i: int, n_images: int, n_hosts: int) -> dict:
    """Pure function index -> frontier row. seq is 1-based (url_sender.py:237)."""
    hv = _h(f"front:{i}")
    host = host_for(i, n_hosts)
    img_i = hv % (n_images + max(2, n_images // 300))  # ~0.3% dangling -> NOT_FOUND
    image_id = image_id_for(img_i)
    bucket = (hv >> 16) % 1000
    url = f"https://{host}/img/{image_id}"
    if bucket < 50:  # 5% scheme-less (url_sender.py:93-101)
        url = f"{host}/img/{image_id}"
    elif bucket < 58:  # 0.8% invalid scheme (backend tasks.py:29-52)
        url = f"ftp://{host}/img/{image_id}"
    elif bucket < 62:  # 0.4% blank-ish line (url_sender.py:72-74)
        url = "" if bucket < 60 else "   "
    elif bucket < 82 and i > 10:  # 2% exact duplicate of an earlier row
        j = hv % (i // 2)
        prev = frontier_row_basic(j, n_images, n_hosts)
        url = prev["url"]
        host = prev["host"]
    priority = 1 if (hv >> 32) % 100 == 0 else 0  # ~1% high-priority rows
    return {
        "seq": i + 1,
        "url": url,
        "host": host,
        "priority": priority,
        "task_id": "campaign-0",
        # per-row crawler config passthrough (~1/3 of rows carry an actions
        # JSON, like reference submissions; the rest null). crawler_args
        # persist across retries (tasks.py:124,159), actions do not.
        "actions": f'{{"click": "#b{hv % 9}"}}' if hv % 3 == 0 else None,
        "crawler_args": [f"--profile={hv % 4}"] if hv % 5 == 0 else None,
    }


def frontier_row_basic(i: int, n_images: int, n_hosts: int) -> dict:
    """The non-dirty url row i would have (used to materialize duplicates
    without recursion)."""
    hv = _h(f"front:{i}")
    host = host_for(i, n_hosts)
    img_i = hv % (n_images + max(2, n_images // 300))
    return {"url": f"https://{host}/img/{image_id_for(img_i)}", "host": host}


def robots_row(rank: int, budget_scale: int = 1) -> dict:
    """``budget_scale`` multiplies per-host politeness budgets (the scaling
    bench uses larger budgets so waves are few and large, the shape a
    10^10-frontier campaign has; semantics are unchanged)."""
    host = f"host{rank}.site{rank % 97}.example"
    hv = _h("robots:" + host)
    blocked = hv % 100 < 2  # ~2% hosts fully blocked
    prefixes = []
    if not blocked and (hv >> 8) % 100 < 3:  # ~3% hosts block a path prefix
        prefixes = ["/img/img_00000000000"]  # blocks image ids 0-9
    return {
        "host": host,
        "full_block": blocked,
        "disallow_prefixes": prefixes,
        "crawl_delay_s": float(1 + (hv >> 16) % 5),
        "max_per_wave": (5 + (hv >> 24) % 46) * budget_scale,
    }


def candidates_doc(i: int, n_images: int, n_hosts: int) -> dict:
    """Pure function index -> candidates JSONL document (FIXTURES.md §4;
    eval_banks.py input shape). Every ~7th doc has zero candidates (the
    'No candidates found' golden); duplicate URLs within a doc exercise the
    CRAWLING-preference dedup (eval_banks.py:46-57)."""
    hv = _h(f"cand:{i}")
    domain = host_for(i, n_hosts)
    cands = []
    if i % 7 != 3:
        n = 1 + hv % 4
        for k in range(n):
            hvk = _h(f"cand:{i}:{k}")
            url = f"https://{domain}/img/{image_id_for(hvk % n_images)}"
            if k > 0 and hvk % 3 == 0:
                url = cands[0]["login_page_candidate"]  # duplicate of first
            cands.append(
                {
                    "login_page_candidate": url,
                    "login_page_strategy": "CRAWLING" if hvk % 5 == 0 else "OTHER",
                    "login_page_actions": (["click", f"#b{hvk % 9}"] if hvk % 2 else None),
                }
            )
    return {
        "domain": domain,
        "scan_config": {"domain": domain} if hv % 2 else {},
        "task_config": {"task_id": f"task-{i}"},
        "landscape_analysis_result": {"login_page_candidates": cands},
    }


def write_candidates_jsonl(path: str, n_docs: int, n_images: int, n_hosts: int) -> str:
    import json

    with open(path, "w") as f:
        for i in range(n_docs):
            f.write(json.dumps(candidates_doc(i, n_images, n_hosts)) + "\n")
        f.write("{not json\n")  # malformed line: PERMISSIVE scan must skip it
    return path


# ---------------------------------------------------------------------------
# pandas / parquet materialization (test scale)
# ---------------------------------------------------------------------------

IMAGES_PA_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def generate_images_pdf(
    n: int, with_expected: bool = False, sizes: tuple[int, ...] = IMAGE_SIZES
) -> pd.DataFrame:
    rows = [image_row(i, sizes) for i in range(n)]
    if not with_expected:
        for r in rows:
            r.pop("_expected_status")
    return pd.DataFrame(rows)


def generate_frontier_pdf(n_urls: int, n_images: int, n_hosts: int) -> pd.DataFrame:
    return pd.DataFrame([frontier_row(i, n_images, n_hosts) for i in range(n_urls)])


def generate_robots_pdf(n_hosts: int, budget_scale: int = 1) -> pd.DataFrame:
    return pd.DataFrame([robots_row(r, budget_scale) for r in range(n_hosts)])


def write_world(out_dir: str, n_images: int, n_urls: int, n_hosts: int) -> dict:
    """Write images/frontier/robots parquet under out_dir; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    img = generate_images_pdf(n_images)
    t = pa.Table.from_pandas(img, schema=IMAGES_PA_SCHEMA, preserve_index=False)
    paths["images"] = os.path.join(out_dir, "images.parquet")
    pq.write_table(t, paths["images"])
    fr = generate_frontier_pdf(n_urls, n_images, n_hosts)
    paths["frontier"] = os.path.join(out_dir, "frontier.parquet")
    pq.write_table(pa.Table.from_pandas(fr, preserve_index=False), paths["frontier"])
    rb = generate_robots_pdf(n_hosts)
    paths["robots"] = os.path.join(out_dir, "robots.parquet")
    pq.write_table(pa.Table.from_pandas(rb, preserve_index=False), paths["robots"])
    return paths


# ---------------------------------------------------------------------------
# Distributed generation (bench scale) — same per-row functions over
# spark.range + mapInPandas, so output is identical at any parallelism.
# ---------------------------------------------------------------------------


def generate_images_spark(
    spark, n: int, parallelism: int = 32, sizes: tuple[int, ...] = IMAGE_SIZES
):
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("fmt", StringType()),
            StructField("caption", StringType()),
            StructField("phash", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [image_row(int(i), sizes) for i in b["id"]]
            for r in rows:
                r.pop("_expected_status")
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=parallelism).mapInPandas(gen, schema)


def generate_frontier_spark(spark, n_urls: int, n_images: int, n_hosts: int, parallelism: int = 32):
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("seq", LongType()),
            StructField("url", StringType()),
            StructField("host", StringType()),
            StructField("priority", IntegerType()),
            StructField("task_id", StringType()),
            StructField("actions", StringType()),
            StructField("crawler_args", ArrayType(StringType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame([frontier_row(int(i), n_images, n_hosts) for i in b["id"]])

    return spark.range(0, n_urls, numPartitions=parallelism).mapInPandas(gen, schema)
