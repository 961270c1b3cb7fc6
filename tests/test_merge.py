"""Stage-then-merge (operators/merge.py) vs the reference's UNIQUE-guarded
import-schema loads (2_mega_vv8_postgres_schema.sql): batch dedup, no
re-insert of committed keys, idempotent replay."""

from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from visiblev8_crawler_spark.catalog import ParquetCatalog
from visiblev8_crawler_spark.operators.merge import merge_append

SCRIPTS = StructType(
    [
        StructField("sha2", StringType()),
        StructField("size", IntegerType()),
        StructField("body", StringType()),
        StructField("load_seq", LongType()),
    ]
)


def test_merge_dedup_and_idempotent(spark, tmp_path_factory):
    cat = ParquetCatalog(spark, str(tmp_path_factory.mktemp("mega")), {"scripts": SCRIPTS})
    keys = ["sha2", "size"]

    b1 = spark.createDataFrame(
        [("a", 1, "first-a", 1), ("a", 1, "dup-of-a-in-batch", 2), ("b", 2, "b", 3)],
        SCRIPTS,
    )
    assert merge_append(cat, "scripts", b1, keys, "load_seq") == 2
    got = {(r["sha2"], r["size"]): r["body"] for r in cat.read("scripts").collect()}
    assert got == {("a", 1): "first-a", ("b", 2): "b"}  # first occurrence won

    b2 = spark.createDataFrame(
        [("a", 1, "replay", 4), ("c", 3, "c", 5)], SCRIPTS
    )
    assert merge_append(cat, "scripts", b2, keys, "load_seq") == 1
    assert merge_append(cat, "scripts", b2, keys, "load_seq") == 0  # idempotent
    got = {(r["sha2"], r["size"]): r["body"] for r in cat.read("scripts").collect()}
    assert got == {("a", 1): "first-a", ("b", 2): "b", ("c", 3): "c"}
