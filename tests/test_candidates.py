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
    # the fixture exercises both branches
    assert any(p == 1 for p, _a in want.values())
    assert any(p == 0 for p, _a in want.values())
