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
