"""robots.txt parser (functions/robots.py): RFC 9309 group semantics on
hand-built bodies, a render->parse round-trip against the synthetic robots
dimension, and the end-to-end gate — a campaign driven from PARSED raw
robots.txt is bit-identical to one driven from the structured dimension."""

import pandas as pd
import pytest

from visiblev8_crawler_spark.functions.robots import (
    parse_robots_txt,
    robots_dim_from_txt,
)


@pytest.mark.parametrize(
    "body,expect",
    [
        # empty / missing -> fail-open
        (None, (False, [], None)),
        ("", (False, [], None)),
        # plain group
        (
            "User-agent: *\nDisallow: /private/\nCrawl-delay: 2",
            (False, ["/private/"], 2.0),
        ),
        # full block
        ("User-agent: *\nDisallow: /", (True, [], None)),
        # empty Disallow = allow all (contributes nothing)
        ("User-agent: *\nDisallow:", (False, [], None)),
        # comments and blank lines ignored; inline comment stripped
        (
            "# banner\n\nUser-agent: *  # all bots\nDisallow: /a # tail\n",
            (False, ["/a"], None),
        ),
        # consecutive User-agent lines share one group
        (
            "User-agent: a\nUser-agent: *\nDisallow: /x",
            (False, ["/x"], None),
        ),
        # a new User-agent AFTER rules starts a new group
        (
            "User-agent: *\nDisallow: /x\nUser-agent: other\nDisallow: /y",
            (False, ["/x"], None),
        ),
        # multiple groups for the same agent merge (RFC 9309 2.2.2)
        (
            "User-agent: *\nDisallow: /x\n\nUser-agent: *\nDisallow: /y\nCrawl-delay: 5",
            (False, ["/x", "/y"], 5.0),
        ),
        # rules before any User-agent line are ignored
        ("Disallow: /x\nUser-agent: *\nDisallow: /y", (False, ["/y"], None)),
        # unknown directives do not split the group
        (
            "User-agent: *\nSitemap: https://e/s.xml\nDisallow: /z",
            (False, ["/z"], None),
        ),
        # smallest crawl-delay across merged groups wins; bad values ignored
        (
            "User-agent: *\nCrawl-delay: 9\nUser-agent: *\nCrawl-delay: 3\nUser-agent: *\nCrawl-delay: nope",
            (False, [], 3.0),
        ),
        # no matching group at all -> fail-open
        ("User-agent: other\nDisallow: /", (False, [], None)),
    ],
)
def test_parse_star_agent(body, expect):
    assert parse_robots_txt(body) == expect


def test_specific_agent_beats_star():
    body = (
        "User-agent: *\nDisallow: /all/\nCrawl-delay: 1\n\n"
        "User-agent: vv8bot\nDisallow: /bot/\nCrawl-delay: 7\n"
    )
    # exact-match groups REPLACE the * groups (RFC 9309 2.2.1), and the
    # match is case-insensitive
    assert parse_robots_txt(body, agent="VV8Bot") == (False, ["/bot/"], 7.0)
    assert parse_robots_txt(body, agent="somebody") == (False, ["/all/"], 1.0)


def _render(row) -> str:
    lines = ["User-agent: *"]
    if row["full_block"]:
        lines.append("Disallow: /")
    for p in row["disallow_prefixes"]:
        lines.append(f"Disallow: {p}")
    if row["crawl_delay_s"] is not None:
        lines.append(f"Crawl-delay: {row['crawl_delay_s']}")
    return "\n".join(lines)


def test_roundtrip_synth_dimension(spark):
    """Render every synthetic robots row as a robots.txt body, parse it
    back through the Arrow kernel, and require the structured dimension to
    survive the trip exactly (prefix order is not part of the contract)."""
    from visiblev8_crawler_spark.sources import synth

    pdf = synth.generate_robots_pdf(200)
    raw = spark.createDataFrame(
        pd.DataFrame(
            {"host": pdf["host"], "robots_txt": [_render(r) for _, r in pdf.iterrows()]}
        )
    )
    parsed = {
        r["host"]: r
        for r in robots_dim_from_txt(raw, default_max_per_wave=0).collect()
    }
    assert len(parsed) == len(pdf)
    for _, want in pdf.iterrows():
        got = parsed[want["host"]]
        assert got["full_block"] == want["full_block"], want["host"]
        assert sorted(got["disallow_prefixes"] or []) == sorted(
            want["disallow_prefixes"] or []
        ), want["host"]
        gd = got["crawl_delay_s"]
        wd = want["crawl_delay_s"]
        assert (gd is None and wd is None) or abs(gd - wd) < 1e-9, want["host"]


def test_campaign_from_parsed_robots_bit_identical(spark, world, tmp_path_factory):
    """The integration gate: run the same campaign once from the structured
    robots dimension and once from robots.txt TEXT rendered from it and
    re-parsed — ledger and rejection sets must be byte-equal (C14 robots
    gating + politeness both driven off the parsed rows)."""
    from visiblev8_crawler_spark.streaming import scheduler
    from visiblev8_crawler_spark.streaming.scheduler import CrawlConfig

    frontier = spark.read.parquet(world["paths"]["frontier"])
    robots = spark.read.parquet(world["paths"]["robots"])
    images = spark.read.parquet(world["paths"]["images"])

    rob_pdf = robots.toPandas()
    raw = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": rob_pdf["host"],
                "robots_txt": [_render(r) for _, r in rob_pdf.iterrows()],
            }
        )
    )
    # max_per_wave is operator config, not robots.txt content — carry the
    # world's values through a join so the politeness caps match exactly
    parsed = (
        robots_dim_from_txt(raw)
        .drop("max_per_wave")
        .join(robots.select("host", "max_per_wave"), "host")
    )

    def run(rb, tag):
        root = str(tmp_path_factory.mktemp(f"robots_{tag}"))
        cat = scheduler.run_campaign(
            spark, root, frontier, rb, images, CrawlConfig(batch_size=150)
        )
        fetches = {
            (r["canon_url"], r["attempt"], r["wave_id"], r["order_in_wave"], r["status"])
            for r in cat.read("fetches").collect()
        }
        rejected = {
            (r["url"], r["reason"]) for r in cat.read("rejected").collect()
        }
        return fetches, rejected

    assert run(robots, "structured") == run(parsed, "parsed")
