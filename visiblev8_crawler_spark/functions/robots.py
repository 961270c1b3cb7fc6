"""robots.txt parsing: raw fetched bodies -> the structured ``robots``
politeness dimension the scheduler consumes (schemas.ROBOTS).

The engine's robots gating (operators/dedup.py rejected='robots',
waves.py zero-cap hosts) joins against a structured per-host dimension; a
real crawl obtains that dimension by fetching each host's /robots.txt and
parsing it. This module is that step, following the Robots Exclusion
Protocol (RFC 9309) subset the dimension models:

- group selection: the groups whose ``User-agent`` matches the crawler
  (exact, case-insensitive) if any exist, else the ``*`` groups — RFC 9309
  §2.2.1 most-specific-match, with ALL matching groups merged (§2.2.2:
  multiple groups for the same agent are combined);
- ``Disallow: /`` in a selected group -> full_block;
- other non-empty ``Disallow`` values -> prefix list (empty Disallow means
  allow-all and contributes nothing); percent-encoding is left as-is (the
  dimension's prefixes are matched against canonicalized paths);
- ``Crawl-delay``: non-standard but honored by the politeness bucket
  (waves.py): smallest value across selected groups (most conservative);
- unknown directives, comments (#), blank lines: ignored per spec;
- a body with no selected group, or an unparseable body, yields the
  crawl-everything row (full_block=False, no prefixes, no delay) — the
  fail-open the public crawlers use for missing/broken robots.txt.

The per-host parse is row-independent branchy string work — exactly the
shape for an Arrow-batched kernel (mapInPandas), like the image decode
kernels; the pure function is separated for direct property testing.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from visiblev8_crawler_spark import schemas


def parse_robots_txt(
    body: str | None, agent: str = "*"
) -> tuple[bool, list[str], float | None]:
    """Pure parse of one robots.txt body for one crawler identity.
    Returns (full_block, disallow_prefixes, crawl_delay_s)."""
    if not body:
        return False, [], None
    agent = agent.lower()
    groups: list[tuple[list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_delay: float | None = None
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_dis, cur_delay, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_delay))
        cur_agents, cur_dis, cur_delay = [], [], None
        in_group_body = False

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                flush()  # a new group starts after any rule line
            cur_agents.append(value.lower())
        elif field in ("disallow", "allow", "crawl-delay"):
            if not cur_agents:
                continue  # rule before any User-agent line: ignored
            in_group_body = True
            if field == "disallow" and value:
                cur_dis.append(value)
            elif field == "crawl-delay":
                try:
                    d = float(value)
                    if d >= 0 and (cur_delay is None or d < cur_delay):
                        cur_delay = d
                except ValueError:
                    pass
        # anything else (Sitemap, unknown): ignored, does not split groups
    flush()

    exact = [g for g in groups if agent in g[0]]
    selected = exact if exact else [g for g in groups if "*" in g[0]]
    if not selected:
        return False, [], None
    full_block = any(d == "/" for _, dis, _ in selected for d in dis)
    prefixes = sorted({d for _, dis, _ in selected for d in dis if d != "/"})
    delays = [d for _, _, d in selected if d is not None]
    return full_block, prefixes, (min(delays) if delays else None)


def robots_dim_from_txt(
    raw: DataFrame,
    agent: str = "*",
    default_max_per_wave: int = 25,
) -> DataFrame:
    """(host, robots_txt) -> schemas.ROBOTS rows via an Arrow-batched
    kernel. ``robots_txt`` null/empty -> fail-open row. ``max_per_wave`` is
    an operator-side concurrency cap, not a robots.txt concept — every row
    gets ``default_max_per_wave``; zero-cap full-block hosts terminate via
    ``full_block`` exactly as synth-built dimensions do."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            fb, dis, cd = [], [], []
            for body in b["robots_txt"]:
                f, d, c = parse_robots_txt(
                    body if body is None or isinstance(body, str) else str(body),
                    agent,
                )
                fb.append(f)
                dis.append(d)
                cd.append(c)
            yield pd.DataFrame(
                {
                    "host": b["host"],
                    "full_block": fb,
                    "disallow_prefixes": dis,
                    "crawl_delay_s": cd,
                    "max_per_wave": default_max_per_wave,
                }
            )

    return schemas.conform(
        raw.mapInPandas(kernel, schemas.ROBOTS), schemas.ROBOTS
    )
