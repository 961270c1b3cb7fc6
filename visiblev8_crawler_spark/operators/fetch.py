"""The fetch+verify operator — the Spark replacement for the reference's
entire browser plane (celery_workers/vv8_worker/tasks.py:41-309 +
vv8_crawler/crawler.js, ~1200 LoC of Puppeteer/Chromium driving).

Per the north_rule, "fetch url" becomes: resolve the url to its ``image_id``,
equi-join the wave against the ``images`` table, and run a vectorized
decode+verify kernel over the Arrow batches (PSNR>=40 dB for lossy + caption
equality + phash/dims checks — verify.py). The reference's hard-timeout /
retry machinery (vv8_worker/tasks.py:131-178) becomes per-row try/except
inside the kernel + a ``status`` column consumed by the retry-once rule.

Scale notes:
- the join is a plain equi-join on image_id: wave side is <= batch_size rows,
  so Spark broadcasts it against the (arbitrarily large) images table and the
  scan prunes to ReadSchema-only columns; no shuffle of image bytes beyond
  the matching rows.
- the kernel is mapInPandas (Arrow batches, zero per-row Python dispatch);
  decode cost dominates and parallelizes per partition.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas
from ..verify import verify_image_row

_OUT_COLS = [f.name for f in schemas.FETCHES.fields]

# per-fetch decode budget (vv8_worker/tasks.py:131-141 hard-timeout analog);
# None disables. Module-level so the kernel closure ships it to executors.
DEFAULT_TIMEOUT_MS: float | None = None


def _verify_batches(
    batches: Iterator[pd.DataFrame], timeout_ms: float | None = None
) -> Iterator[pd.DataFrame]:
    for b in batches:
        assert b["phash"].dtype == "int64", f"phash must stay int64, got {b['phash'].dtype}"
        out = {c: [] for c in ("status", "psnr", "caption_ok", "phash_ok", "decode_ms", "error")}
        for image_id, found, data, w, h, fmt, caption, phash in zip(
            b["image_id"], b["found"], b["bytes"], b["w"], b["h"], b["fmt"], b["caption"], b["phash"]
        ):
            v = verify_image_row(
                image_id if isinstance(image_id, str) else "",
                data if found else None,
                int(w),
                int(h),
                fmt if isinstance(fmt, str) else None,
                caption if isinstance(caption, str) else None,
                int(phash),
                timeout_ms=timeout_ms,
            )
            out["status"].append(v.status)
            out["psnr"].append(min(v.psnr, 1e9))  # keep inf out of parquet stats
            out["caption_ok"].append(v.caption_ok)
            out["phash_ok"].append(v.phash_ok)
            out["decode_ms"].append(v.decode_ms)
            out["error"].append(v.error)
        res = pd.DataFrame(
            {
                "canon_url": b["canon_url"],
                "image_id": b["image_id"],
                "host": b["host"],
                "wave_id": b["wave_id"],
                "order_in_wave": b["order_in_wave"],
                "attempt": b["attempt"],
                "priority": b["priority"],
                "seq": b["seq"],
                "task_id": b["task_id"],
                "actions": b["actions"],
                "crawler_args": b["crawler_args"],
                "partition_id": b["partition_id"],
                **out,
            }
        )
        yield res[_OUT_COLS]


def fetch_verify(
    wave: DataFrame, images: DataFrame, timeout_ms: float | None = DEFAULT_TIMEOUT_MS
) -> DataFrame:
    """wave (<= batch_size rows, from select_wave) ⋈ images -> FETCHES rows.

    Left join: a url whose image_id has no row (or no image_id at all) comes
    out NOT_FOUND — the analog of a navigation failure.

    Join strategy (scale): Spark can't broadcast the preserved side of a
    LeftOuter join, and shuffling the full images table per wave is absurd.
    So: (1) LeftSemi with the broadcast wave ids prunes the images scan to
    the <= batch_size matching rows (predicate reaches the file scan; with
    Iceberg/bucketed layout this is partition/file pruning), (2) the pruned
    rows are themselves small enough to broadcast back for the LeftOuter.
    Net: the big table is scanned with a pushed filter, never shuffled."""
    # no .distinct() on the wave ids: the semi-join dedups anyway, and the
    # distinct would cost an extra shuffle stage per wave just to shrink an
    # already-small broadcast
    wave_ids = wave.select("image_id").where(F.col("image_id").isNotNull())
    matched = images.join(F.broadcast(wave_ids), "image_id", "left_semi")
    joined = wave.alias("w").join(
        F.broadcast(matched.alias("i")),
        F.col("w.image_id") == F.col("i.image_id"),
        "left",
    ).select(
        "w.canon_url",
        "w.image_id",
        "w.host",
        "w.wave_id",
        "w.order_in_wave",
        "w.attempt",
        "w.priority",
        "w.seq",
        "w.task_id",
        "w.actions",
        "w.crawler_args",
        # ``found`` + coalesced numerics: a nullable int64 column turns into
        # float64 at the Arrow->pandas boundary, which silently corrupts
        # 64-bit hashes (53-bit mantissa). Keep every precision-critical
        # column non-null; bytes==null still encodes NOT_FOUND.
        F.col("i.image_id").isNotNull().alias("found"),
        "i.bytes",
        F.coalesce(F.col("i.w"), F.lit(-1)).alias("w"),
        F.coalesce(F.col("i.h"), F.lit(-1)).alias("h"),
        "i.fmt",
        "i.caption",
        F.coalesce(F.col("i.phash"), F.lit(0).cast("long")).alias("phash"),
        F.spark_partition_id().alias("partition_id"),
    )
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _verify_batches(batches, timeout_ms)

    return joined.mapInPandas(kernel, schemas.FETCHES)
