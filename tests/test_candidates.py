"""JSONL candidate ingest (operators/candidates.py) vs a pure-Python mirror
of eval_banks.preprocess_candidates (eval_banks.py:20-70)."""

import json

from visiblev8_crawler_spark.operators.candidates import ingest_candidates
from visiblev8_crawler_spark.sources import synth


def _mirror(path):
    """Reference semantics, sequentially: per doc, group candidates by url,
    prefer first CRAWLING (case-insensitive), else first occurrence."""
    out = {}
    with open(path) as f:
        for line in f:
            try:
                doc = json.loads(line)
            except json.JSONDecodeError:
                continue
            domain = (doc.get("scan_config", {}) or {}).get("domain") or doc.get("domain", "")
            task = (doc.get("task_config", {}) or {}).get("task_id", "")
            grouped = {}
            for cand in (doc.get("landscape_analysis_result", {}) or {}).get(
                "login_page_candidates", []
            ):
                url = (cand.get("login_page_candidate") or "").strip()
                if url:
                    grouped.setdefault(url, []).append(cand)
            for url, group in grouped.items():
                chosen = next(
                    (c for c in group if (c.get("login_page_strategy") or "").upper() == "CRAWLING"),
                    group[0],
                )
                prio = 1 if (chosen.get("login_page_strategy") or "").upper() == "CRAWLING" else 0
                out[(domain, task, url)] = (prio, chosen.get("login_page_actions"))
    return out


def test_ingest_matches_eval_banks_mirror(spark, tmp_path):
    path = synth.write_candidates_jsonl(str(tmp_path / "cands.jsonl"), 120, 300, 40)
    want = _mirror(path)
    rows = ingest_candidates(spark, path).collect()

    got = {
        (r["scan_domain"], r["task_id"], r["url"]): (
            r["priority"],
            json.loads(r["actions"]) if r["actions"] is not None else None,
        )
        for r in rows
    }
    assert got == want

    # seq is a total order starting at 1 with no gaps
    seqs = sorted(r["seq"] for r in rows)
    assert seqs == list(range(1, len(rows) + 1))
    # ... and is exactly the rank in (scan_domain, task_id, url) order —
    # bit-identical to the old global-window assignment (VERDICT r2 #7)
    by_key = sorted(rows, key=lambda r: (r["scan_domain"], r["task_id"], r["url"]))
    assert [r["seq"] for r in by_key] == list(range(1, len(rows) + 1))
    # the fixture exercises both branches
    assert any(p == 1 for p, _a in want.values())
    assert any(p == 0 for p, _a in want.values())


def test_ingest_seq_has_no_single_partition_exchange(spark, tmp_path):
    """The seq assignment must stay distributed: range repartition +
    per-partition offsets, never a global one-task window."""
    path = synth.write_candidates_jsonl(str(tmp_path / "c2.jsonl"), 40, 100, 10)
    df = ingest_candidates(spark, path)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in p, p
