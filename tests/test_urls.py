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


def test_image_id_extraction():
    assert U.image_id_from_path("/img/img_000000000042") == "img_000000000042"
    assert U.image_id_from_path("/nope") is None
