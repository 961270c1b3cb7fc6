"""ParquetCatalog atomicity/isolation semantics (catalog.py) — the
properties the scheduler's exactly-once resume stands on (analog of the
reference's per-URL progress pickle + '.completed' rename,
url_sender.py:146-200, 293-296)."""

import json
import os

from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from visiblev8_crawler_spark.catalog import ParquetCatalog

T = StructType([StructField("k", StringType()), StructField("v", IntegerType())])


def _rows(cat):
    return {(r["k"], r["v"]) for r in cat.read("t").collect()}


def test_snapshot_isolation_uncommitted_invisible(spark, tmp_path_factory):
    """Data files written without a manifest swap (a crash between write and
    commit) must be invisible to readers and harmless on re-run."""
    root = str(tmp_path_factory.mktemp("cat_iso"))
    cat = ParquetCatalog(spark, root, {"t": T})
    cat.commit("w0", appends={"t": spark.createDataFrame([("a", 1)], T)})
    assert _rows(cat) == {("a", 1)}

    # simulate the crash: files land on disk, manifest never swaps
    cat._write("t", spark.createDataFrame([("GHOST", 99)], T), "w1")
    assert _rows(cat) == {("a", 1)}, "uncommitted files leaked into a read"

    # the re-run writes the same deterministic path and commits; the orphan
    # is overwritten, the new snapshot is exactly the intended one
    cat.commit("w1", appends={"t": spark.createDataFrame([("b", 2)], T)}, watermark=1)
    assert _rows(cat) == {("a", 1), ("b", 2)}
    assert cat.watermark() == 1


def test_manifest_swap_is_atomic_unit(spark, tmp_path_factory):
    """A multi-table commit publishes all tables in one swap: the manifest on
    disk never names a path that does not exist and fully describes every
    committed table."""
    root = str(tmp_path_factory.mktemp("cat_multi"))
    cat = ParquetCatalog(spark, root, {"t": T, "u": T})
    cat.commit(
        "w0",
        appends={"t": spark.createDataFrame([("a", 1)], T)},
        replaces={"u": spark.createDataFrame([("x", 9)], T)},
        watermark=0,
        prepared=True,
    )
    with open(os.path.join(root, "_manifest.json")) as f:
        m = json.load(f)
    assert set(m["tables"]) == {"t", "u"}
    for paths in m["tables"].values():
        for p in paths:
            assert os.path.isdir(p), p
    assert m["watermark"] == 0 and m["prepared"] is True
    assert {(r["k"], r["v"]) for r in cat.read("u").collect()} == {("x", 9)}


def test_compaction_multiple_cycles(spark, tmp_path_factory):
    """Periodic compaction at a fixed threshold must not reuse a tag across
    cycles (round-1 bug: 'compact-{file_sets}' collided, overwriting the
    path the lazy snapshot was reading). Three full append->compact cycles,
    contents exact after each."""
    root = str(tmp_path_factory.mktemp("cat_compact"))
    cat = ParquetCatalog(spark, root, {"t": T})
    want = set()
    for cycle in range(3):
        for i in range(2):  # two appends -> file_sets hits the threshold
            row = (f"c{cycle}", i)
            cat.commit(f"a{cycle}-{i}", appends={"t": spark.createDataFrame([row], T)})
            want.add(row)
        assert cat.compact("t", min_file_sets=2) is True
        assert cat.file_sets("t") == 1
        assert _rows(cat) == want, f"cycle {cycle} lost rows"
    # tags were unique: three distinct compact paths existed over time
    assert cat.commit_seq() == 9  # 6 appends + 3 compactions


def test_concurrent_commits_serialize(spark, tmp_path_factory):
    """Two committers racing (the ingest-stream-next-to-wave-loop shape):
    every file set survives — the flock serializes the manifest
    read-modify-write, so no commit can publish over a stale manifest."""
    import threading

    root = str(tmp_path_factory.mktemp("cat_race"))
    cat = ParquetCatalog(spark, root, {"t": T})
    errs = []

    def committer(tag_prefix, lo, hi):
        try:
            c = ParquetCatalog(spark, root, {"t": T})  # separate instance, same root
            for i in range(lo, hi):
                c.commit(f"{tag_prefix}-{i}", appends={"t": spark.createDataFrame([(tag_prefix, i)], T)})
        except Exception as e:  # pragma: no cover
            errs.append(e)

    a = threading.Thread(target=committer, args=("wave", 0, 5))
    b = threading.Thread(target=committer, args=("ingest", 100, 105))
    a.start(); b.start(); a.join(); b.join()
    assert not errs
    assert _rows(cat) == {("wave", i) for i in range(5)} | {("ingest", i) for i in range(100, 105)}
    assert cat.file_sets("t") == 10, "a racing commit lost a manifest swap"
