"""benchmark_contamination correctness gate. The query carries no driver
oracle (the hard-signal window holds 50 rows, already filled by the 50
oracle-gated queries), so this pytest replica — same DuckDB engine the
driver uses, SQL kept next to the Spark plan — IS its correctness check.
"""

import duckdb

from visiblev8_crawler_spark.plans.queries import QUERIES
from visiblev8_crawler_spark.plans.textops import _CONTAMINATION_ORACLE_SQL

SF_DIR = "/root/testdata/sf0.01"


def test_contamination_oracle_replica(spark):
    got = [
        (r["doc_id"], r["n_shingles"], r["n_hit"], r["overlap"], r["contaminated"])
        for r in QUERIES["benchmark_contamination"].spark(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = [tuple(r) for r in con.execute(_CONTAMINATION_ORACLE_SQL).fetchall()]
    assert len(got) > 0
    assert got == want


def test_contamination_planted_leak(spark):
    """Semantics, not just parity: plant a test-split doc whose text IS a
    train-split doc's text — the screen must flag it with overlap 1.0,
    while an unrelated test doc stays clean."""
    from pyspark.sql import functions as F

    from visiblev8_crawler_spark.plans.textops import benchmark_contamination

    # find one md5-bucket doc_id per split deterministically
    def bucket(doc_id):
        import hashlib

        return ord(hashlib.md5(str(doc_id).encode()).hexdigest()[0]) % 10

    train_id = next(i for i in range(1, 500) if bucket(i) < 8)
    test_ids = [i for i in range(1, 500) if bucket(i) >= 9][:2]
    leak_id, clean_id = test_ids
    body = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (train_id, body, len(body), "synthetic"),
        (leak_id, body, len(body), "synthetic"),  # verbatim leak
        (clean_id, "one two three four five six seven eight", 39, "synthetic"),
    ]
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="contam_")
    spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in benchmark_contamination(spark, d).collect()}
    assert out[leak_id]["contaminated"] and out[leak_id]["overlap"] == 1.0
    assert not out[clean_id]["contaminated"] and out[clean_id]["n_hit"] == 0


def test_contamination_hashed_shingles_parity(spark):
    """The 100 TB variant (hash_shingles=True: int64 xxhash64 keys through
    every shuffle instead of n-token strings) must produce the EXACT same
    screen as the string form on the fixture corpus — and the hashing must
    be collision-free there, so the parity is exercising identical shingle
    sets, not cancelling collisions."""
    from pyspark.sql import functions as F

    from visiblev8_crawler_spark.plans.textops import benchmark_contamination

    a = sorted(tuple(r) for r in benchmark_contamination(spark, SF_DIR).collect())
    b = sorted(
        tuple(r)
        for r in benchmark_contamination(spark, SF_DIR, hash_shingles=True).collect()
    )
    assert a == b

    # collision-free on this corpus: |distinct shingles| == |distinct hashes|
    from visiblev8_crawler_spark.plans.textops import _CONTAM_N, _with_tokens
    from visiblev8_crawler_spark.plans.queries import load

    d = _with_tokens(load(spark, SF_DIR, "documents"))
    n = _CONTAM_N
    sh = d.select(
        F.explode(
            F.when(
                F.col("n_tokens") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.col("n_tokens") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
                ),
            ).otherwise(F.array(F.concat_ws(" ", F.col("toks"))))
        ).alias("sh")
    )
    counts = sh.agg(
        F.countDistinct("sh").alias("strings"),
        F.countDistinct(F.xxhash64("sh")).alias("hashes"),
    ).collect()[0]
    assert counts["strings"] == counts["hashes"] > 0


def test_pii_scrub_oracle_replica(spark):
    """doc_pii_scrub's DuckDB replica (degenerate no-op on the synthetic
    corpus: identity text, zero counts — still hash-exact)."""
    import duckdb

    from visiblev8_crawler_spark.plans.queries import QUERIES
    from visiblev8_crawler_spark.plans.textops import _PII_ORACLE_SQL

    got = sorted(
        tuple(r) for r in QUERIES["doc_pii_scrub"].spark(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(_PII_ORACLE_SQL).fetchall())
    assert got == want
    assert all(not r[5] for r in got), "synthetic corpus must carry no PII"


def test_pii_scrub_planted_documents(spark):
    """Semantics on planted PII: counts, typed placeholders, and the
    untouched remainder of the text."""
    import os
    import tempfile

    from visiblev8_crawler_spark.plans.textops import doc_pii_scrub

    rows = [
        (1, "contact bob.smith+spam@mail-host.co.uk or alice@example.org now", 60, "s"),
        (2, "server at 192.168.1.254 and 10.0.0.1 rebooted", 45, "s"),
        (3, "call +4915123456789 today", 25, "s"),
        (4, "mixed a@b.io via 8.8.8.8 dial +1234567890 end", 45, "s"),
        (5, "clean document with no identifiers at all", 41, "s"),
        (6, "not an ip 1234.5.6.7890 and not a mail foo@bar", 46, "s"),
    ]
    d = tempfile.mkdtemp(prefix="pii_")
    spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in doc_pii_scrub(spark, d).collect()}

    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (2, 0, 0)
    assert out[1]["scrubbed"] == "contact <EMAIL> or <EMAIL> now"
    assert (out[2]["n_ips"], out[2]["scrubbed"]) == (
        2, "server at <IP> and <IP> rebooted"
    )
    assert (out[3]["n_phones"], out[3]["scrubbed"]) == (1, "call <PHONE> today")
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (1, 1, 1)
    assert out[4]["scrubbed"] == "mixed <EMAIL> via <IP> dial <PHONE> end"
    assert not out[5]["has_pii"] and out[5]["scrubbed"] == rows[4][1]
    # near-misses stay: 4-digit first octet fails \b\d{1,3}\., bare foo@bar
    # has no dotted TLD
    assert not out[6]["has_pii"] and out[6]["scrubbed"] == rows[5][1]


def test_canonicalize_oracle_replica(spark):
    """doc_neardup_canonicalize's DuckDB replica (rotation policy: new
    operators are pytest-oracled for their first round, driver-oracled
    next). Full-corpus keeper mapping, exact row equality."""
    from visiblev8_crawler_spark.plans.textops import _CANONICALIZE_ORACLE_SQL

    got = [
        tuple(r)
        for r in QUERIES["doc_neardup_canonicalize"].spark(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = [tuple(r) for r in con.execute(_CANONICALIZE_ORACLE_SQL).fetchall()]
    assert len(got) == len(want) > 0
    assert got == want
    # the mapping is well-formed: every keeper is kept, keepers map to self
    by_id = {r[0]: r for r in got}
    for doc_id, component, keeper_id, kept, csize in got:
        assert by_id[keeper_id][3] == 1  # keeper row flagged kept
        assert by_id[keeper_id][2] == keeper_id  # keeper maps to itself
        assert kept == (1 if doc_id == keeper_id else 0)


def test_canonicalize_planted_cluster(spark):
    """Semantics, not just parity: two verbatim-duplicate docs must land in
    one cluster with the LONGER one (by n_chars) as keeper; an unrelated
    doc stays a singleton keeping itself."""
    import os
    import tempfile

    from visiblev8_crawler_spark.plans.textops import doc_neardup_canonicalize

    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, body, "en", "synthetic", 10),   # duplicate, shorter
        (2, body, "en", "synthetic", 99),   # duplicate, longer -> keeper
        (3, "one two three four five six seven eight nine", "en", "synthetic", 45),
    ]
    d = tempfile.mkdtemp(prefix="canon_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in doc_neardup_canonicalize(spark, d).collect()}
    assert out[1]["component"] == out[2]["component"] == 1
    assert out[1]["keeper_id"] == out[2]["keeper_id"] == 2
    assert out[1]["kept"] == 0 and out[2]["kept"] == 1
    assert out[1]["csize"] == out[2]["csize"] == 2
    assert out[3]["keeper_id"] == 3 and out[3]["kept"] == 1 and out[3]["csize"] == 1


def test_lsh_incremental_oracle_replica(spark):
    from visiblev8_crawler_spark.plans.textops import _LSH_INCR_ORACLE_SQL

    got = sorted(
        tuple(r)
        for r in QUERIES["minhash_lsh_pairs_incremental"].spark(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(_LSH_INCR_ORACLE_SQL).fetchall())
    assert len(got) > 0
    assert got == want


def test_lsh_incremental_equals_full_restricted(spark):
    """The incremental path's contract: exactly the full-recompute pairs
    that touch the delta (doc_b = max of pair, so doc_b >= cursor <=> the
    pair involves at least one new doc) — no pair invented, none lost."""
    from pyspark.sql import functions as F

    full = QUERIES["minhash_lsh_pairs"].spark(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cursor = (docs.agg(F.max("doc_id")).collect()[0][0] + 1) * 8 // 10
    want = sorted(tuple(r) for r in full.filter(F.col("doc_b") >= cursor).collect())
    got = sorted(
        tuple(r)
        for r in QUERIES["minhash_lsh_pairs_incremental"].spark(spark, SF_DIR).collect()
    )
    assert got == want


def test_lsh_incremental_planted_delta_dup(spark):
    """Semantics: a delta doc that verbatim-duplicates an old-corpus doc
    must surface as an all-bands pair (old_id, new_id); an unrelated delta
    doc must pair with nothing."""
    import os
    import tempfile

    from visiblev8_crawler_spark.plans.textops import minhash_lsh_pairs_incremental

    # 10 docs, cursor = (9+1)*8//10 = 8 -> ids 8,9 are the delta
    base = [
        (i, f"unique words for document number {i} body {i * 7} tail {i * 13}")
        for i in range(8)
    ]
    rows = base + [
        (8, base[3][1]),                       # delta dup of old doc 3
        (9, "nothing shares these tokens at all zzz qqq xxx"),
    ]
    d = tempfile.mkdtemp(prefix="lshincr_")
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in minhash_lsh_pairs_incremental(spark, d).collect()
    }
    assert pairs.get((3, 8)) == 4, pairs  # identical text -> all 4 bands
    assert not any(9 in p for p in pairs), pairs


def test_duplicate_spans_oracle_replica(spark):
    """doc_duplicate_spans is born pytest-oracled (rotation policy):
    same DuckDB engine, same SQL a driver oracle would run."""
    from visiblev8_crawler_spark.plans.textops import _DUPSPAN_ORACLE_SQL

    got = [
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in QUERIES["doc_duplicate_spans"].spark(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = [tuple(r) for r in con.execute(_DUPSPAN_ORACLE_SQL).fetchall()]
    assert len(got) > 0
    assert got == want


def test_duplicate_spans_planted(spark):
    """Semantics on a planted world: a 7-token passage shared by two docs
    yields one maximal span per doc at the right offsets; a back-to-back
    within-doc repeat merges into one span (adjacency, gap == n); a
    spaced within-doc repeat splits into two (gap > n); a doc with no
    repeated 5-gram emits nothing."""
    import os
    import tempfile

    from visiblev8_crawler_spark.plans.textops import doc_duplicate_spans

    shared = "c1 c2 c3 c4 c5 c6 c7"
    rows = [
        (0, f"u1 u2 {shared} u3"),                    # passage at tokens 3..9
        (1, f"v1 {shared} v2 v3"),                    # passage at tokens 2..8
        (2, "w1 w2 w3 w4 w5 w6"),                     # nothing duplicated
        (3, "r1 r2 r3 r4 r5 m r1 r2 r3 r4 r5"),      # spaced repeat: 2 spans
        (4, "s1 s2 s3 s4 s5 s1 s2 s3 s4 s5"),        # adjacent repeat: 1 span
    ]
    d = tempfile.mkdtemp(prefix="dupspan_")
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = [
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in doc_duplicate_spans(spark, d).collect()
    ]
    assert got == [
        (0, 3, 9, 7),
        (1, 2, 8, 7),
        (3, 1, 5, 5),
        (3, 7, 11, 5),
        (4, 1, 10, 10),
    ], got


def test_scrub_duplicate_spans_oracle_replica(spark):
    from visiblev8_crawler_spark.plans.textops import _SCRUB_SPANS_ORACLE_SQL

    got = [
        (r["doc_id"], r["text_clean"], r["n_tokens"], r["n_removed"])
        for r in QUERIES["doc_scrub_duplicate_spans"].spark(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = [tuple(r) for r in con.execute(_SCRUB_SPANS_ORACLE_SQL).fetchall()]
    assert len(got) > 0
    assert sum(r[3] for r in got) > 0  # the scrub must actually remove tokens
    assert got == want


def test_scrub_duplicate_spans_planted(spark):
    """The planted dupspan world, scrubbed: shared passages excised from
    both docs, untouched docs pass through verbatim with n_removed=0, a
    fully-duplicated doc collapses to the empty string."""
    import os
    import tempfile

    from visiblev8_crawler_spark.plans.textops import doc_scrub_duplicate_spans

    shared = "c1 c2 c3 c4 c5 c6 c7"
    rows = [
        (0, f"u1 u2 {shared} u3"),
        (1, f"v1 {shared} v2 v3"),
        (2, "w1 w2 w3 w4 w5 w6"),
        (3, "s1 s2 s3 s4 s5 s1 s2 s3 s4 s5"),   # one merged span = whole doc
    ]
    d = tempfile.mkdtemp(prefix="scrubspan_")
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = [
        (r["doc_id"], r["text_clean"], r["n_tokens"], r["n_removed"])
        for r in doc_scrub_duplicate_spans(spark, d).collect()
    ]
    assert got == [
        (0, "u1 u2 u3", 10, 7),
        (1, "v1 v2 v3", 10, 7),
        (2, "w1 w2 w3 w4 w5 w6", 6, 0),
        (3, "", 10, 10),
    ], got


def test_mix_weights_oracle_replica(spark):
    from visiblev8_crawler_spark.plans.textops import _MIX_WEIGHTS_ORACLE_SQL

    got = [
        (r["source"], r["n_docs"], r["n_tokens"], r["token_share"], r["mix_weight"])
        for r in QUERIES["corpus_mix_weights"].spark(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = [tuple(r) for r in con.execute(_MIX_WEIGHTS_ORACLE_SQL).fetchall()]
    assert len(got) > 0
    assert got == want
    # the scarcest source carries weight exactly 1.0; shares sum to ~1
    assert max(r[4] for r in got) == 1.0
    assert abs(sum(r[3] for r in got) - 1.0) < 1e-4


def test_unigram_logppl_oracle_replica(spark):
    from visiblev8_crawler_spark.plans.textops import _LOGPPL_ORACLE_SQL

    got = [
        (r["doc_id"], r["n_tokens"], r["logppl"])
        for r in QUERIES["doc_unigram_logppl"].spark(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = [tuple(r) for r in con.execute(_LOGPPL_ORACLE_SQL).fetchall()]
    assert len(got) > 0
    assert got == want


def test_unigram_logppl_planted_ordering(spark):
    """Semantics: a doc of corpus-common tokens must score strictly lower
    (more likely) than a doc of corpus-rare tokens, and a doc whose every
    token is unique scores exactly ln(N_total) (each token appears once)."""
    import math
    import os
    import tempfile

    from visiblev8_crawler_spark.plans.textops import doc_unigram_logppl

    common = " ".join(["the"] * 10)           # 'the' df = 10
    rare = "r1 r2 r3 r4 r5"                   # each df = 1
    d = tempfile.mkdtemp(prefix="logppl_")
    spark.createDataFrame(
        [(0, common, "en", "web", len(common)), (1, rare, "en", "web", len(rare))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r for r in doc_unigram_logppl(spark, d).collect()}
    n_total = 15
    assert got[0]["logppl"] < got[1]["logppl"]
    assert got[0]["logppl"] == round(math.log(n_total / 10), 6)
    assert got[1]["logppl"] == round(math.log(n_total), 6)


def test_chunk_overlap_oracle_replica(spark):
    from visiblev8_crawler_spark.plans.textops import _CHUNK_ORACLE_SQL

    got = sorted(
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["chunk_len"], r["chunk_text"])
        for r in QUERIES["doc_chunk_overlap"].spark(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(_CHUNK_ORACLE_SQL).fetchall())
    assert len(got) > 0
    assert got == want


def test_chunk_overlap_semantics(spark, tmp_path_factory):
    """Hand-computed chunking of a 40-token doc at size 32 / stride 24:
    two chunks, the second 16 tokens long, overlapping the first by 8."""
    import os

    from visiblev8_crawler_spark.plans.textops import doc_chunk_overlap

    d = str(tmp_path_factory.mktemp("chunkdoc"))
    toks = [f"t{i}" for i in range(40)]
    spark.createDataFrame(
        [(7, " ".join(toks), "en", "web", 40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = sorted(
        (r["chunk_id"], r["start_tok"], r["chunk_len"], r["chunk_text"])
        for r in doc_chunk_overlap(spark, d).collect()
    )
    assert rows == [
        (0, 0, 32, " ".join(toks[0:32])),
        (1, 24, 16, " ".join(toks[24:40])),
    ], rows
    # the declared 8-token overlap, verified from the output itself
    head = rows[0][3].split(" ")
    tail = rows[1][3].split(" ")
    assert head[-8:] == tail[:8]


def test_heavy_tokens_oracle_replica(spark):
    from visiblev8_crawler_spark.plans.textops import (
        _HEAVY_TOKENS_ORACLE_SQL,
        _HH_PRUNE_M,
    )

    got = [
        (r["tok"], r["n_occurrences"], r["share"])
        for r in QUERIES["doc_heavy_tokens_topk"].spark(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = [tuple(r) for r in con.execute(_HEAVY_TOKENS_ORACLE_SQL).fetchall()]
    assert len(got) > 0
    assert got == want
    # the exactness precondition the docstring promises: every returned
    # share clears the 1/M pruning bar, so candidate loss was impossible
    assert min(r[2] for r in got) > 1.0 / _HH_PRUNE_M


def test_heavy_tokens_planted_skew(spark, tmp_path_factory):
    """Semantics under the distribution the sketch exists for: a long
    unique-token tail plus 3 planted heavy tokens — the heavies must
    surface as the exact top-3 with exact counts."""
    import os

    from visiblev8_crawler_spark.plans.textops import doc_heavy_tokens_topk

    d = str(tmp_path_factory.mktemp("hhdocs"))
    rows = []
    for i in range(200):
        # each doc: 5 unique tail tokens + the 3 heavies (aaa 3x, bbb 2x, ccc 1x)
        toks = [f"tail{i}_{j}" for j in range(5)] + ["aaa"] * 3 + ["bbb"] * 2 + ["ccc"]
        rows.append((i, " ".join(toks), "en", "web", len(toks)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = [(r["tok"], r["n_occurrences"]) for r in doc_heavy_tokens_topk(spark, d).collect()]
    assert got[:3] == [("aaa", 600), ("bbb", 400), ("ccc", 200)], got


def test_mix_sample_oracle_replica(spark):
    from visiblev8_crawler_spark.plans.textops import _MIX_SAMPLE_ORACLE_SQL

    got = sorted(
        (r["doc_id"], r["source"], r["lang"], r["u"], r["mix_weight"])
        for r in QUERIES["corpus_mix_sample"].spark(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(_MIX_SAMPLE_ORACLE_SQL).fetchall())
    assert len(got) > 0
    assert got == want


def test_mix_sample_semantics(spark):
    """The sample must implement the weights it claims: the scarcest
    source (weight 1.0) keeps every doc, and each source's kept fraction
    tracks its weight within binomial noise (4 sigma)."""
    import math

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_by_source = {r["source"]: r["n"] for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    kept = QUERIES["corpus_mix_sample"].spark(spark, SF_DIR).collect()
    kept_by_source = {}
    wgt_by_source = {}
    for r in kept:
        kept_by_source[r["source"]] = kept_by_source.get(r["source"], 0) + 1
        wgt_by_source[r["source"]] = r["mix_weight"]
    scarcest = max(wgt_by_source, key=lambda s: wgt_by_source[s])
    assert wgt_by_source[scarcest] == 1.0
    assert kept_by_source[scarcest] == n_by_source[scarcest]
    for s, w in wgt_by_source.items():
        n = n_by_source[s]
        sigma = math.sqrt(n * w * (1 - w))
        assert abs(kept_by_source[s] - n * w) <= 4 * sigma + 1, (s, w, n, kept_by_source[s])
