"""Canonicalization contract: python mirror == Spark builtins, plus the
validity truth table from the reference's own unit test
(backend/tests/unit/test_api_v1.py:30-48 shape; rules at backend tasks.py:29-52)."""

import pytest

from visiblev8_crawler_spark.functions import urls as U
from visiblev8_crawler_spark.sources import synth

CASES = [
    ("https://example.com/a/b?x=1", True, "https://example.com/a/b?x=1"),
    ("http://Example.COM/A", True, "http://example.com/A"),
    ("example.com/path", True, "https://example.com/path"),  # url_sender.py:93-101
    ("  https://pad.example.com  ", True, "https://pad.example.com/"),
    ("https://example.com", True, "https://example.com/"),
    ("https://example.com:8443/x", True, "https://example.com/x"),
    ("https://user@example.com/x", True, "https://example.com/x"),
    ("https://example.com/x#frag", True, "https://example.com/x"),
    ("ftp://example.com/x", False, None),  # invalid scheme
    ("", False, None),  # blank line, url_sender.py:72-74
    ("   ", False, None),
    ("https:///nopath", False, None),  # empty netloc
]


@pytest.mark.parametrize("url,valid,canon", CASES)
def test_python_canonicalize(url, valid, canon):
    c = U.canonicalize(url)
    assert c["valid"] == valid
    if valid:
        assert c["canon_url"] == canon


def test_spark_matches_python(spark):
    """The Spark builtin plan and the simulator mirror agree on every case
    plus the full dirty synthetic frontier."""
    urls = [c[0] for c in CASES] + [
        r["url"] for r in synth.generate_frontier_pdf(500, 200, 20).to_dict("records")
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r
        for r in U.with_canonical(df).select(
            "url", "valid", "canon_url", "scheme", "host", "path", "query", "etld1", "stemmed"
        ).collect()
    }
    for u in urls:
        py = U.canonicalize(u)
        sp = got[u]
        for k in ("valid", "canon_url", "scheme", "host", "path", "query", "etld1", "stemmed"):
            assert sp[k] == py[k], (u, k, sp[k], py[k])


def test_etld1():
    assert U.canonicalize("https://a.b.site7.example/x")["etld1"] == "site7.example"


PSL_CASES = [
    # (host, etld1) — the 2_mega:24 url_etld1 contract on multi-label suffixes
    ("example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("example.co.uk", "example.co.uk"),  # exact 2-label rule
    ("www.example.co.uk", "example.co.uk"),
    ("deep.sub.example.co.uk", "example.co.uk"),
    ("example.gov.uk", "example.gov.uk"),
    ("foo.act.edu.au", "foo.act.edu.au"),  # exact 3-label rule
    ("bar.foo.act.edu.au", "foo.act.edu.au"),
    ("something.ck", ""),  # *.ck wildcard: something.ck IS a suffix
    ("shop.something.ck", "shop.something.ck"),
    ("www.ck", "www.ck"),  # !www.ck exception: registrable
    ("a.www.ck", "www.ck"),
    ("city.kawasaki.jp", "city.kawasaki.jp"),  # !city.kawasaki.jp exception
    ("ward.kawasaki.jp", ""),  # *.kawasaki.jp wildcard
    ("x.ward.kawasaki.jp", "x.ward.kawasaki.jp"),
    ("user.github.io", "user.github.io"),  # private-section rule
    ("a.user.github.io", "user.github.io"),
    ("co.uk", ""),  # the host IS a public suffix
    ("com", ""),
    ("localhost", ""),
    ("", ""),
]


@pytest.mark.parametrize("host,expected", PSL_CASES)
def test_etld1_public_suffix_python(host, expected):
    from visiblev8_crawler_spark.functions.psl import etld1_py

    assert etld1_py(host) == expected


def test_etld1_public_suffix_spark(spark):
    """The InSet expression tree and the Python mirror agree on every PSL case."""
    from visiblev8_crawler_spark.functions.psl import etld1_col

    import pyspark.sql.functions as F

    df = spark.createDataFrame([(h,) for h, _ in PSL_CASES], "host string")
    got = {r["host"]: r["e"] for r in df.select("host", etld1_col(F.col("host")).alias("e")).collect()}
    for host, expected in PSL_CASES:
        assert got[host] == expected, (host, got[host], expected)


def test_image_id_extraction():
    assert U.image_id_from_path("/img/img_000000000042") == "img_000000000042"
    assert U.image_id_from_path("/nope") is None
