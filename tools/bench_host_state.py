"""Table-mode politeness throughput bench (VERDICT r4 #1).

_TableHostState is the declared 10^8-host path: politeness state lives as a
catalog table with per-wave delta appends, a merge-on-read view resolved on
every selection, and a periodic fold. Its selection is equivalence-proven
bit-identical to the dict path (tests/test_host_state_table.py) — this
script supplies the missing THROUGHPUT evidence at the standard 500k
campaign (BASELINE.md §C flags), with a same-moment dict-mode control and
interleaved legs (dict, table, dict, table) so machine drift shows up as
spread within a mode instead of silently biasing the comparison
(benchmarking discipline, BASELINE.md §F).

Per-wave walls come from each leg's committed metrics table, so the cost of
the merge-on-read view (every wave) and the fold (waves at the fold
cadence) is visible per wave, not just in the total.

Usage:
    python tools/bench_host_state.py [--workdir /tmp/vv8_hs_bench]
        [--urls 500000] [--hosts 10000] [--fold-every 4] [--legs 4]

Prints ONE JSON report; run it at loadavg < 1 (the report records loadavg
per leg so contaminated numbers self-flag).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def loadavg() -> list[float]:
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def per_wave(catdir: str) -> list[dict]:
    import duckdb

    m = json.load(open(os.path.join(catdir, "_manifest.json")))
    globs = [p + "/*.parquet" for p in m["tables"]["metrics"]]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT wave_id, n_attempted, round(wall_s, 3) AS wall_s "
        f"FROM read_parquet({globs}) ORDER BY wave_id"
    ).fetchall()
    return [{"wave": r[0], "attempted": r[1], "wall_s": r[2]} for r in rows]


def run_leg(mode: str, idx: int, args) -> dict:
    wd = os.path.join(args.workdir, f"leg{idx}_{mode}")
    os.makedirs(wd, exist_ok=True)
    # share one generated world across all legs (same seeds -> same frontier)
    world_src = os.path.join(args.workdir, "world")
    world_dst = os.path.join(wd, "world")
    if os.path.isdir(world_src) and not os.path.exists(world_dst):
        os.symlink(world_src, world_dst)
    shutil.rmtree(os.path.join(wd, "catalog"), ignore_errors=True)

    la0 = loadavg()
    t0 = time.perf_counter()
    cmd = [
        "spark-submit", "--master", f"local[{args.cpus}]",
        "--py-files", args.pyfiles,
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.driver.memory={args.driver_mem}",
        os.path.join(REPO, "jobs", "run_campaign.py"),
        "--workdir", wd,
        "--images", "2000", "--urls", str(args.urls),
        "--hosts", str(args.hosts), "--batch-size", str(args.batch_size),
        "--wave-period", "1200", "--stop-after-waves", "8",
        "--host-state-mode", mode,
        "--host-state-fold-every", str(args.fold_every),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    wall = time.perf_counter() - t0
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    # make the world shareable after the first leg generated it
    if not os.path.isdir(world_src) and os.path.isdir(world_dst):
        shutil.move(world_dst, world_src)
        os.symlink(world_src, world_dst)
    return {
        "mode": mode,
        "leg": idx,
        "loadavg_start": la0,
        "loadavg_end": loadavg(),
        "submit_wall_s": round(wall, 1),
        "result": {
            k: res[k]
            for k in ("waves", "attempted", "ok", "failed", "wave_wall_s",
                      "steady_rows_per_s")
        },
        "per_wave": per_wave(os.path.join(wd, "catalog")),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/vv8_hs_bench")
    ap.add_argument("--urls", type=int, default=500_000)
    ap.add_argument("--hosts", type=int, default=10_000)
    ap.add_argument("--batch-size", type=int, default=50_000)
    ap.add_argument("--fold-every", type=int, default=4)
    ap.add_argument("--legs", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--driver-mem", default="24g")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    args.pyfiles = os.path.join(args.workdir, "vv8spark.zip")
    subprocess.run(
        ["zip", "-qr", args.pyfiles, "visiblev8_crawler_spark"],
        cwd=REPO, check=True,
    )

    legs = []
    for i in range(args.legs):
        mode = "dict" if i % 2 == 0 else "table"
        legs.append(run_leg(mode, i, args))
        print(
            f"# leg {i} {mode}: steady {legs[-1]['result']['steady_rows_per_s']} "
            f"rows/s, load {legs[-1]['loadavg_start']}",
            file=sys.stderr,
        )

    def steady(mode):
        xs = [l["result"]["steady_rows_per_s"] for l in legs if l["mode"] == mode]
        return xs

    d, t = steady("dict"), steady("table")
    sel = {
        m: (
            {k: legs_m[0]["result"][k] for k in ("attempted", "ok", "failed")}
            if legs_m
            else None
        )
        for m, legs_m in (("dict", [l for l in legs if l["mode"] == "dict"]),
                          ("table", [l for l in legs if l["mode"] == "table"]))
    }
    report = {
        "metric": "host_state_table_vs_dict_steady_rows_per_s",
        "flags": {
            "urls": args.urls, "hosts": args.hosts, "batch_size": args.batch_size,
            "wave_period": 1200, "stop_after_waves": 8,
            "fold_every": args.fold_every, "cpus": args.cpus,
        },
        "dict_steady": d,
        "table_steady": t,
        "table_over_dict": round(
            (sum(t) / len(t)) / (sum(d) / len(d)), 4
        ) if d and t else None,
        "selection_identical": (
            sel["dict"] == sel["table"] if sel["dict"] and sel["table"] else None
        ),
        "selection": sel,
        "legs": legs,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
