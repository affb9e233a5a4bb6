"""F13 display formatting and the JDBC source seam (SURVEY §2.8 F13,
§1.5). No JDBC driver ships in this container, so the seam is
contract-tested: option plumbing + clean failure without a driver."""

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.functions.display import (
    format_display,
    format_pct,
)
from sportstv_streaming_data_warehouse_spark.sources.jdbc import read_jdbc


def test_format_display(spark):
    df = spark.createDataFrame([(1234567.891, 0.1234)], ["v", "r"])
    row = df.select(
        format_display(F.col("v")).alias("i"),
        format_display(F.col("v"), 2).alias("d2"),
        format_pct(F.col("r")).alias("p"),
    ).first()
    assert row["i"] == "1,234,568"
    assert row["d2"] == "1,234,567.89"
    assert row["p"] == "12.3%"


def test_read_jdbc_fails_cleanly_without_driver(spark):
    with pytest.raises(Exception) as e:
        read_jdbc(
            spark,
            "jdbc:sqlite:/tmp/nonexistent.db",
            "events",
            partition_column="event_id",
            lower_bound=0,
            upper_bound=1000,
            num_partitions=4,
        )
    msg = str(e.value)
    assert "driver" in msg.lower() or "jdbc" in msg.lower()


def test_read_jdbc_requires_bounds_with_partition_column(spark):
    with pytest.raises(ValueError):
        read_jdbc(
            spark, "jdbc:sqlite:/tmp/x.db", "t", partition_column="id"
        )
