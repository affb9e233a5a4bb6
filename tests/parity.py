"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet fixtures, then compares row count, column names, values
(order-insensitive), AND value typing.

Type strictness (added after the round-4 post-mortem): the driver's
value-hash is sensitive to the pandas representation of each cell, so a
DuckDB oracle that returns HUGEINT (pandas float64) against a Spark
BIGINT (pandas int64), or DECIMAL (pandas object/Decimal) against a
Spark DOUBLE, hash-mismatches even when the values are numerically
identical — exactly what happened to x_boilerplate_ngrams and
x_domain_mix_plan in round 4.  This gate therefore (a) refuses any
oracle whose DuckDB logical result type is HUGEINT/UHUGEINT/DECIMAL
(the fix is a CAST in the oracle SQL, e.g. ``CAST(SUM(x) AS BIGINT)``),
and (b) compares a canonical value-class per cell (int vs float vs
Decimal vs str vs date vs datetime ...) in addition to the normalized
value.  A local pass is intended to imply a driver pass; round 4 proved
value-equality alone does not give that property, value+type equality
restores it.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from sportstv_streaming_data_warehouse_spark.sources.fixtures import FIXTURE_TABLES

#: DuckDB logical types that pandas represents differently from the
#: matching Spark type, poisoning the driver's value-hash.  Oracles must
#: CAST these away (BIGINT for integer sums, DOUBLE for decimals).
FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def assert_oracle_types_portable(
    con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"
) -> None:
    """Fail if the oracle's DuckDB result schema contains a type whose
    pandas representation diverges from Spark's (HUGEINT/DECIMAL/...).

    Planning-only: ``con.sql(...)`` is lazy, ``.types`` does not run the
    query.
    """
    rel = con.sql(sql)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(str(t).upper().startswith(f) or f in str(t).upper()
               for f in FORBIDDEN_DUCK_TYPES)
    ]
    assert not bad, (
        f"{name}: oracle result columns {bad} have DuckDB types whose pandas "
        f"representation differs from Spark's and would fail the driver's "
        f"value-hash. CAST them in the oracle SQL (e.g. CAST(SUM(x) AS "
        f"BIGINT), CAST(... AS DOUBLE))."
    )


def _value_class(v) -> str:
    """Canonical class of a cell as the driver's hash would see it."""
    if v is None:
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, Decimal):
        return "decimal"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "null" if math.isnan(v) else "float"
    if isinstance(v, datetime.datetime):  # before date: datetime IS a date
        return "datetime"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "array"
    return type(v).__name__


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


def _classes(df: pd.DataFrame) -> list[tuple]:
    """Row-aligned canonical value-class tuples, sorted the same way as
    _normalize so classes[i] describes rows[i]."""
    cols = sorted(df.columns)
    df = df[cols]
    pairs = [
        (
            tuple(_norm_value(v) for v in row),
            tuple(_value_class(v) for v in row),
        )
        for row in df.itertuples(index=False)
    ]
    pairs.sort(key=lambda p: tuple(str(x) for x in p[0]))
    return [c for _, c in pairs]


def _assert_rows_equal(a_df: pd.DataFrame, e_df: pd.DataFrame, name: str,
                       left: str, right: str) -> None:
    a_rows, e_rows = _normalize(a_df), _normalize(e_df)
    mismatches = [(a, e) for a, e in zip(a_rows, e_rows) if a != e]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 5:\n"
        + "\n".join(f"  {left}={a}\n  {right}={e}" for a, e in mismatches[:5])
    )
    a_cls, e_cls = _classes(a_df), _classes(e_df)
    type_mismatches = [
        (r, a, e) for r, a, e in zip(a_rows, a_cls, e_cls) if a != e
    ]
    assert not type_mismatches, (
        f"{name}: values match but {len(type_mismatches)} rows differ in "
        f"value TYPE (driver hash is type-sensitive); first 5:\n"
        + "\n".join(
            f"  row={r}\n  {left}-types={a}\n  {right}-types={e}"
            for r, a, e in type_mismatches[:5]
        )
    )


def compare_frames(left_df, right_df, name: str = "?"):
    """Full value+type comparison of two Spark DataFrames (stricter than
    the driver gate): columns sorted by name, rows order-insensitive,
    values exact, cell value-classes identical."""
    actual = left_df.toPandas()
    expected = right_df.toPandas()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch\n left ={sorted(actual.columns)}\n right={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count mismatch left={len(actual)} right={len(expected)}"
    )
    _assert_rows_equal(actual, expected, name, "left ", "right")


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    assert_oracle_types_portable(con, sql, name)
    actual = spark_df.toPandas()
    expected = con.execute(sql).df()

    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch\n spark={sorted(actual.columns)}\n duck ={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count mismatch spark={len(actual)} duck={len(expected)}"
    )
    _assert_rows_equal(actual, expected, name, "spark", "duck ")
