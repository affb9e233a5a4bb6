"""Explicit StructType schemas for every table the engine touches
(SURVEY.md §1.2) — schema-on-write everywhere; nothing is inferred.

Reference sites: the SQLite operational schema is reconstructed from its
usage (loadAnalyticsDB.PractII.VarmaA.R:322-326, 247-258, 157), the CSV
header from etl.R:485-487, and the star schema from
createStarSchema.PractII.VarmaA.R:71-169 (DDL twins live in
plans/warehouse.py).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- operational sources (extract tier) -----------------------------------

STREAMING_TXNS_SCHEMA = _s(  # etl.R:322-326
    ("transaction_id", LongType()),
    ("user_id", LongType()),
    ("asset_id", StringType()),
    ("streaming_date", StringType()),  # date-as-string in the source
    ("minutes_streamed", IntegerType()),
    ("completed", IntegerType()),
)

CSV_TXNS_SCHEMA = _s(  # header at etl.R:485-487; superset of the above
    ("transaction_id", LongType()),
    ("subscriber_id", LongType()),
    ("user_id", LongType()),
    ("asset_id", StringType()),
    ("streaming_date", StringType()),
    ("streaming_start_time", StringType()),
    ("minutes_streamed", IntegerType()),
    ("device_type", StringType()),
    ("quality_streamed", StringType()),
    ("completed", StringType()),  # arrives as string; cast at etl.R:530
)

SUBSCRIBERS_SCHEMA = _s(("user_id", LongType()), ("postal_code", StringType()))
POSTAL2CITY_SCHEMA = _s(("postal_code", StringType()), ("city_id", IntegerType()))
CITIES_SCHEMA = _s(("city_id", IntegerType()), ("country_id", IntegerType()))
COUNTRIES_SCHEMA = _s(("country_id", IntegerType()), ("country", StringType()))
ASSETS_SCHEMA = _s(("asset_id", StringType()), ("sport", StringType()))

# --- star schema (load tier; DDL in plans/warehouse.py) -------------------

DIM_DATE_SCHEMA = _s(  # schema.R:71-87
    ("date_id", IntegerType()),
    ("full_date", DateType()),
    ("year", IntegerType()),
    ("quarter", IntegerType()),
    ("month", IntegerType()),
    ("week", IntegerType()),
    ("day_of_month", IntegerType()),
    ("day_of_week", IntegerType()),
)

DIM_COUNTRY_SCHEMA = _s(  # schema.R:95-101
    ("country_id", IntegerType()), ("country_name", StringType())
)

DIM_SPORT_SCHEMA = _s(  # schema.R:109-115
    ("sport_id", IntegerType()), ("sport_name", StringType())
)

FACT_SCHEMA = _s(  # schema.R:132-148
    ("date_id", IntegerType()),
    ("country_id", IntegerType()),
    ("sport_name", StringType()),
    ("transaction_count", LongType()),
    ("unique_user_count", LongType()),
    ("total_minutes_streamed", LongType()),
    ("completed_streams", LongType()),
    ("avg_minutes_per_stream", DoubleType()),
    ("year", IntegerType()),
    ("quarter", IntegerType()),
    ("month", IntegerType()),
    ("week", IntegerType()),
)
