"""Seed-source scans (sources/seeds.py): line order -> seq, blank handling,
Tranco CSV mapping — checked against plain-Python file reads, and fed
end-to-end into prepare_frontier."""

from pyspark.sql import functions as F

from visiblev8_crawler_spark.operators.dedup import prepare_frontier
from visiblev8_crawler_spark.sources.seeds import frontier_from_text, frontier_from_tranco_csv


def test_text_seed_order_and_blanks(spark, tmp_path):
    urls = [f"https://h{i % 5}.example/img/img_{i:012d}" for i in range(200)]
    urls[7] = ""  # blank line
    urls[50] = "  "  # whitespace line
    p = tmp_path / "seeds.txt"
    p.write_text("\n".join(urls) + "\n")

    rows = frontier_from_text(spark, str(p)).collect()
    got = {r["seq"]: r["url"] for r in rows}
    assert got == {i + 1: u.strip() for i, u in enumerate(urls)}

    # blank lines flow into the rejected ledger as 'invalid'
    robots = spark.createDataFrame(
        [], "host string, full_block boolean, disallow_prefixes array<string>, "
        "crawl_delay_s double, max_per_wave int"
    )
    prep = prepare_frontier(frontier_from_text(spark, str(p)), robots)
    bad = {r["seq"] for r in prep.filter(F.col("reason") == "invalid").collect()}
    assert bad == {8, 51}


def test_tranco_csv(spark, tmp_path):
    p = tmp_path / "tranco.csv"
    p.write_text("1,example.com\n2,foo.org\nbadrank,x.com\n3,\n4,bar.net\n")
    rows = frontier_from_tranco_csv(spark, str(p)).collect()
    got = {r["seq"]: r["url"] for r in rows}
    assert got == {1: "http://example.com", 2: "http://foo.org", 4: "http://bar.net"}
