"""Corrupt-record-tolerant CSV ingestion: the production posture for the
reference's CSV source — malformed rows land in a quarantine column
instead of failing the load, and the clean/dirty split is auditable
(the streaming-warehouse version of etl.R's quality filtering)."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("transaction_id", LongType()),
        StructField("user_id", LongType()),
        StructField("minutes_streamed", IntegerType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def test_permissive_csv_quarantines_bad_rows(spark, tmp_path):
    path = str(tmp_path / "dirty.csv")
    with open(path, "w") as f:
        f.write("transaction_id,user_id,minutes_streamed\n")
        f.write("1,10,30\n")
        f.write("2,11,not_a_number\n")      # bad int
        f.write("3,12,45\n")
        f.write("garbage line entirely\n")  # wrong arity
        f.write("4,13,50\n")

    df = (
        spark.read.schema(SCHEMA)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()  # required before filtering on the corrupt-record column
    )
    clean = df.filter(F.col("_corrupt_record").isNull())
    dirty = df.filter(F.col("_corrupt_record").isNotNull())

    assert clean.count() == 3
    assert {r["transaction_id"] for r in clean.collect()} == {1, 3, 4}
    assert dirty.count() == 2
    # the raw text of every quarantined row is preserved for audit
    raws = {r["_corrupt_record"] for r in dirty.collect()}
    assert any("not_a_number" in r for r in raws)
    assert any("garbage" in r for r in raws)
    df.unpersist()
