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
