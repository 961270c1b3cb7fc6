"""Property-based tests (hypothesis) for the pure kernels the engine's
equality guarantees rest on: URL canonicalization and the Bloom filter."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from visiblev8_crawler_spark.functions.urls import canonicalize
from visiblev8_crawler_spark.operators.bloom import BloomFilter

url_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=":/?#.@-_ "),
    max_size=80,
)


@given(url_text)
@settings(max_examples=300, deadline=None)
def test_canonicalize_total_and_idempotent(raw):
    """canonicalize never throws, and canonical urls are fixed points —
    the property that makes re-submitting a canon_url (add_seeds, retries,
    simulator replay) hit the same seen-set key every time."""
    c = canonicalize(raw)
    assert set(c) == {
        "scheme", "host", "path", "query", "etld1", "stemmed", "canon_url", "valid",
    }
    if c["valid"]:
        c2 = canonicalize(c["canon_url"])
        assert c2["canon_url"] == c["canon_url"]
        assert c2["host"] == c["host"]
        assert c2["valid"]


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=2**63 - 1),
)
@settings(max_examples=100, deadline=None)
def test_bloom_never_false_negative(h1s, h2_seed):
    """For ANY hash inputs, every added key must probe positive — the
    property that makes the bloom pre-filter + exact-join path equal to the
    plain exact anti-join."""
    h1 = np.array(h1s, dtype=np.int64).astype(np.uint64)
    h2 = (h1 * np.uint64(h2_seed)) + np.uint64(0x9E3779B9)
    m, k = BloomFilter.params_for(len(h1s), 0.01)
    bf = BloomFilter(m, k, np.zeros(m // 8, dtype=np.uint8))
    bf.add_hashes(h1, h2)
    assert bf.maybe_contains(h1, h2).all()


# --- PSL eTLD+1 properties ----------------------------------------------

label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8)
# hosts built from random labels plus real PSL suffix parts, so both the
# default-rule path and every rule class get exercised
suffix_part = st.sampled_from(
    ["com", "co.uk", "ac.uk", "com.au", "act.edu.au", "ck", "www.ck",
     "kawasaki.jp", "city.kawasaki.jp", "github.io", "example", "co", "uk"]
)
host_strategy = st.builds(
    lambda labels, suf: ".".join(labels + ([suf] if suf else [])),
    st.lists(label, min_size=0, max_size=4),
    st.one_of(suffix_part, st.just("")),
)


@given(host_strategy)
@settings(max_examples=300, deadline=None)
def test_etld1_invariants(host):
    """For ANY host: etld1_py never throws; the result is '' or a suffix of
    the host made of whole labels; and it is idempotent (etld1 of an etld1
    is itself — a registrable domain is its own registrable domain)."""
    from visiblev8_crawler_spark.functions.psl import etld1_py

    e = etld1_py(host)
    if e:
        assert host == e or host.endswith("." + e), (host, e)
        assert etld1_py(e) == e, (host, e)


def test_etld1_spark_python_parity_random(spark):
    """The InSet expression tree equals the Python mirror on a large random
    host sample (hypothesis seeds a fixed corpus so the Spark job runs once)."""
    import pyspark.sql.functions as F

    from visiblev8_crawler_spark.functions.psl import etld1_col, etld1_py

    corpus = []
    # deterministic pseudo-random hosts over the same alphabet + suffix parts
    import hashlib

    parts = ["com", "co.uk", "ac.uk", "com.au", "act.edu.au", "ck", "www.ck",
             "kawasaki.jp", "city.kawasaki.jp", "github.io", "example", "co", "uk", ""]
    for i in range(600):
        hv = int(hashlib.md5(f"pslhost:{i}".encode()).hexdigest(), 16)
        n = hv % 4
        labels = [f"l{(hv >> (8 * (j + 1))) % 997}" for j in range(n)]
        suf = parts[(hv >> 40) % len(parts)]
        host = ".".join(labels + ([suf] if suf else []))
        corpus.append(host)
    # round 4: also draw suffixes from the FULL generated rule tables so
    # the fuzz reaches 4/5-label exact rules, deep wildcard bases and the
    # punycode twins — classes the hand-picked list above never touches
    from visiblev8_crawler_spark.functions.psl_data import EXACT, EXC, WILD

    pools = [sorted(v) for v in EXACT.values()]
    pools += [sorted(v) for v in WILD.values()]
    pools += [sorted(v) for v in EXC.values()]
    for i in range(600):
        hv = int(hashlib.md5(f"pslrule:{i}".encode()).hexdigest(), 16)
        pool = pools[hv % len(pools)]
        rule = pool[(hv >> 16) % len(pool)]
        n = (hv >> 48) % 3
        labels = [f"x{(hv >> (8 * (j + 2))) % 997}" for j in range(n)]
        corpus.append(".".join(labels + [rule]))
    corpus = [h for h in corpus if h]
    df = spark.createDataFrame([(h,) for h in corpus], "host string")
    got = {
        r["host"]: r["e"]
        for r in df.select("host", etld1_col(F.col("host")).alias("e")).collect()
    }
    for h in corpus:
        assert got[h] == etld1_py(h), h
