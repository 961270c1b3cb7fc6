"""Incremental fetch-ledger forwarder — the downstream poll loop of the
reference (resend_script_ids.py:59-99: poll the store every cycle, forward
new records in batches) rebuilt on the catalog's snapshot-to-snapshot
``poll()`` API, so each cycle reads ONLY the file sets committed since the
last cursor instead of re-scanning the whole ledger:

    spark-submit --py-files vv8spark.zip jobs/poll_fetches.py \
        --workdir /tmp/vcamp --out /tmp/forwarded [--follow --interval 5]

Each poll appends the delta as one parquet batch under --out and advances a
cursor persisted next to the output, so a killed forwarder resumes from its
last committed cursor (the reference's forwarder restarts from a DB
watermark the same way). When a poll crosses a compaction epoch the catalog
flags ``rebaselined`` and this forwarder resets: it clears its batches and
re-forwards the full table once — the documented exactly-once recovery,
applied at the output level so the union of forwarded batches always equals
the ledger with no row duplicated or lost.

Exit: without --follow, forwards whatever is new and exits 0. With
--follow, loops every --interval seconds until the campaign manifest
reports the frontier drained (prepared and no pending) AND a final poll
returns empty, then exits 0.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True, help="campaign workdir (holds catalog/)")
    ap.add_argument("--out", required=True, help="output dir for forwarded batches")
    ap.add_argument("--table", default="fetches")
    ap.add_argument("--follow", action="store_true", help="keep polling until drained")
    ap.add_argument("--interval", type=float, default=5.0)
    ap.add_argument("--max-polls", type=int, default=0, help="stop after N polls (0 = no cap)")
    return ap


def _cursor_path(out: str, table: str) -> str:
    return os.path.join(out, f"_cursor_{table}.json")


def load_cursor(out: str, table: str) -> int | None:
    p = _cursor_path(out, table)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["cursor"]


def save_cursor(out: str, table: str, cursor: int) -> None:
    # same write-then-rename the catalog manifest uses: a kill mid-save
    # leaves the previous cursor, and the next run re-forwards that delta
    # into the same deterministic batch path (overwrite, not duplicate)
    p = _cursor_path(out, table)
    with open(p + ".tmp", "w") as f:
        json.dump({"cursor": cursor}, f)
    os.replace(p + ".tmp", p)


def poll_once(cat, table: str, out: str) -> dict:
    """One forwarder step: read the delta, write it as a batch, advance the
    cursor. Returns {rows, cursor, rebaselined}."""
    prefix = f"batch_{table}_"
    cursor = load_cursor(out, table)
    # drop unacknowledged batches from a run killed between batch write and
    # cursor save: their rows are still "new" relative to the committed
    # cursor, so keeping them would double-count once this poll (possibly at
    # a NEWER next_cursor, hence a different path) re-forwards the delta.
    # Batch paths embed the table name (like the cursor file) so two tables
    # forwarded into one --out can never clobber each other's batches.
    for fn in os.listdir(out):
        if fn.startswith(prefix) and int(fn[len(prefix):]) > (cursor or 0):
            shutil.rmtree(os.path.join(out, fn), ignore_errors=True)
    # an expired cursor (consumer down longer than the expiry horizon)
    # comes back from poll() as rebaselined=True with the full table —
    # same recovery as an epoch crossing, no special case here
    delta, next_cursor, rebaselined = cat.poll(table, cursor)
    if rebaselined:
        # epoch crossing: the delta IS the full table; superseded batches
        # must go or the union double-counts every pre-compaction row
        for fn in os.listdir(out):
            if fn.startswith(prefix):
                shutil.rmtree(os.path.join(out, fn), ignore_errors=True)
    if next_cursor == (cursor or 0) and not rebaselined:
        return {"rows": 0, "cursor": next_cursor, "rebaselined": False}
    # deterministic per-cursor path: a forwarder killed after the write but
    # before the cursor save re-runs the same delta into the same path.
    # Observation rides the sink write so the delta is scanned ONCE (the
    # repo's one-pass sink+counts pattern), not count()-then-write twice.
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    batch = os.path.join(out, f"{prefix}{next_cursor:08d}")
    obs = Observation()
    delta.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(batch)
    n = int(obs.get["n"])
    if n == 0:
        # new file sets that held zero rows: don't leave an empty batch dir
        shutil.rmtree(batch, ignore_errors=True)
    save_cursor(out, table, next_cursor)
    return {"rows": n, "cursor": next_cursor, "rebaselined": rebaselined}


def drained(cat) -> bool:
    from visiblev8_crawler_spark.streaming import scheduler

    return cat.prepared() and scheduler.pending_df(cat).count() == 0


def main() -> int:
    args = build_parser().parse_args()
    os.makedirs(args.out, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("vv8-poll-fetches").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from visiblev8_crawler_spark.streaming import scheduler

    cat = scheduler.open_catalog(spark, os.path.join(args.workdir, "catalog"))

    polls = 0
    total = 0
    while True:
        step = poll_once(cat, args.table, args.out)
        polls += 1
        total += step["rows"]
        print(json.dumps({"poll": polls, **step}), flush=True)
        if args.max_polls and polls >= args.max_polls:
            break
        if not args.follow:
            break
        if step["rows"] == 0 and drained(cat):
            break
        time.sleep(args.interval)
    print(json.dumps({"forwarded_total_this_run": total, "polls": polls}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
