"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet fixtures, then compares row count, column names, and values
(order-insensitive). Stricter than the driver's value-hash: values must
match exactly after normalization, so a local pass implies a driver pass.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pandas as pd

from sportstv_streaming_data_warehouse_spark.sources.fixtures import FIXTURE_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # collapse -0.0 vs 0.0
        return v + 0.0 if v != 0 else 0.0
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm_value(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def compare_frames(left_df, right_df, name: str = "?"):
    """Full value-hash comparison of two Spark DataFrames (same
    normalization as the driver gate): columns sorted by name, rows
    order-insensitive, values exact."""
    actual = left_df.toPandas()
    expected = right_df.toPandas()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch\n left ={sorted(actual.columns)}\n right={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count mismatch left={len(actual)} right={len(expected)}"
    )
    a_rows = _normalize(actual)
    e_rows = _normalize(expected)
    mismatches = [(a, e) for a, e in zip(a_rows, e_rows) if a != e]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 5:\n"
        + "\n".join(f"  left ={a}\n  right={e}" for a, e in mismatches[:5])
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    actual = spark_df.toPandas()
    expected = con.execute(sql).df()

    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch\n spark={sorted(actual.columns)}\n duck ={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count mismatch spark={len(actual)} duck={len(expected)}"
    )
    a_rows = _normalize(actual)
    e_rows = _normalize(expected)
    mismatches = [
        (i, a, e) for i, (a, e) in enumerate(zip(a_rows, e_rows)) if a != e
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 5:\n"
        + "\n".join(f"  spark={a}\n  duck ={e}" for _, a, e in mismatches[:5])
    )
