"""Data-quality framework: single-pass expectation evaluation, uniqueness
and referential checks, and the reference's fact-validation suite
recast as declarative expectations."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans import quality as Q
from sportstv_streaming_data_warehouse_spark.plans import star

from .fixtures_ref import generate


def test_expectations_on_clean_and_dirty_data(spark):
    clean = spark.createDataFrame(
        [(1, 10, "A"), (2, 20, "B"), (3, 30, "A")], ["id", "v", "cat"]
    )
    rep = Q.check(
        clean,
        [Q.not_null("v"), Q.in_range("v", 0, 100), Q.accepted_values("cat", ["A", "B"])],
        unique_keys=[["id"]],
    )
    assert rep.passed and rep.total_rows == 3

    dirty = spark.createDataFrame(
        [(1, None, "A"), (1, 200, "Z"), (3, -5, "B")],
        "id long, v long, cat string",
    )
    rep = Q.check(
        dirty,
        [Q.not_null("v"), Q.in_range("v", 0, 100), Q.accepted_values("cat", ["A", "B"])],
        unique_keys=[["id"]],
    )
    assert not rep.passed
    assert rep.violations["not_null(v)"] == 1
    assert rep.violations["in_range(v,[0,100])"] == 3  # null, 200, -5
    assert rep.violations["accepted_values(cat)"] == 1
    assert rep.unique_violations["unique(id)"] == 1  # id=1 twice


def test_referential_check(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,)], ["country_id"])
    dim = spark.createDataFrame([(1,), (2,), (3,)], ["country_id"])
    rep = Q.check(fact, [], references={"country_id": (dim, "country_id")})
    assert rep.orphan_counts["ref(country_id->country_id)"] == 1


def test_fact_validation_as_expectations(spark):
    """The etl.R:624-753 validation stage, declaratively: week in [1,53],
    no NULL keys, non-negative metrics, fact FKs resolve to dims."""
    data = {k: spark.createDataFrame(v) for k, v in generate(2000, 300).items()}
    etl = star.run_etl(
        spark,
        streaming_txns=data["streaming_txns"],
        csv_txns=data["csv_txns"],
        subscribers=data["subscribers"],
        postal2city=data["postal2city"],
        cities=data["cities"],
        countries=data["countries"],
        assets=data["assets"],
    )
    rep = Q.check(
        etl["fact"],
        [
            Q.not_null("date_id"),
            Q.not_null("country_id"),
            Q.not_null("sport_name"),
            Q.in_range("week", 1, 53),
            Q.in_range("month", 1, 12),
            Q.in_range("day_of_week", 1, 7) if "day_of_week" in etl["fact"].columns
            else Q.in_range("quarter", 1, 4),
            Q.non_negative("transaction_count"),
            Q.non_negative("total_minutes_streamed"),
        ],
        unique_keys=[["date_id", "country_id", "sport_name"]],
        references={
            "country_id": (etl["dim_country"], "country_id"),
            "date_id": (etl["dim_date"], "date_id"),
        },
    )
    assert rep.passed, rep
    # unique_user_count can never exceed transaction_count
    bad = etl["fact"].filter(
        F.col("unique_user_count") > F.col("transaction_count")
    ).count()
    assert bad == 0
