"""S3: CSV ingestion with an explicit schema — one declarative read
replacing the reference's header/headerless chunked read.csv loop
(etl.R:479-488), including the string-typed `completed` needing a cast
(etl.R:530)."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.model import CSV_TXNS_SCHEMA as CSV_SCHEMA
from sportstv_streaming_data_warehouse_spark.sources.fixtures import read_csv_source

from .fixtures_ref import generate


def test_csv_read_with_schema(spark, tmp_path):
    pdf = generate(100, 400)["csv_txns"]
    path = str(tmp_path / "txns.csv")
    pdf.to_csv(path, index=False)

    df = read_csv_source(spark, path, CSV_SCHEMA, header=True)
    assert df.columns == [f.name for f in CSV_SCHEMA.fields]
    assert df.count() == len(pdf)

    # the cast path (P5): string completed → int, NULLs preserved
    casted = df.withColumn("completed", F.col("completed").cast("int"))
    total = casted.agg(F.sum("completed")).first()[0]
    expected = int(pdf["completed"].dropna().astype(int).sum())
    assert total == expected

    # multi-file reads collapse into the same single declarative scan
    path2 = str(tmp_path / "txns2.csv")
    pdf.to_csv(path2, index=False)
    both = read_csv_source(spark, str(tmp_path / "*.csv"), CSV_SCHEMA)
    assert both.count() == 2 * len(pdf)
