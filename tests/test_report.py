"""The reference's report tables (README.md:208-235) over the star fact:
structural invariants the reference documents, asserted on the
reference-shaped fixtures — shares sum to 100%, only countries with
subscribers appear, every recovered sport is present, YoY growth is
(cur-prev)/prev with a NULL first year, and the display layer formats
without disturbing the numeric tables."""

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans import report, star

from .fixtures_ref import SPORTS, generate


@pytest.fixture(scope="module")
def fact(spark):
    data = generate()
    sdfs = {k: spark.createDataFrame(v) for k, v in data.items()}
    return star.run_etl(
        spark,
        streaming_txns=sdfs["streaming_txns"],
        csv_txns=sdfs["csv_txns"],
        subscribers=sdfs["subscribers"],
        postal2city=sdfs["postal2city"],
        cities=sdfs["cities"],
        countries=sdfs["countries"],
        assets=sdfs["assets"],
    )["fact"].cache()


def test_streaming_by_sport(fact):
    rows = report.streaming_by_sport(fact).collect()
    # every sport (known + recovered labels) present, ordered by volume
    assert {r["sport_name"] for r in rows} == set(SPORTS.values())
    vols = [r["total_streams"] for r in rows]
    assert vols == sorted(vols, reverse=True)
    for r in rows:
        # avg duration consistent with totals (minutes per stream)
        expect = r["total_hours"] * 60.0 / r["total_streams"]
        assert abs(r["avg_duration_min"] - expect) < 1e-9


def test_top_markets(fact):
    rows = report.top_markets(fact).collect()
    # only the 4 countries with subscribers (Italy/Slovakia vanish,
    # report.Rmd:619), shares sum to exactly 1
    assert {r["country_id"] for r in rows} <= {1, 2, 3, 4}
    assert len(rows) == 4
    assert abs(sum(r["market_share"] for r in rows) - 1.0) < 1e-12
    vols = [r["total_streams"] for r in rows]
    assert vols == sorted(vols, reverse=True)


def test_yoy_growth(fact):
    rows = report.yoy_growth(fact).collect()
    years = [r["year"] for r in rows]
    assert years == sorted(years)
    assert rows[0]["yoy_growth"] is None  # no prior year
    for prev, cur in zip(rows, rows[1:]):
        expect = (cur["transactions"] - prev["transactions"]) / prev["transactions"]
        assert abs(cur["yoy_growth"] - expect) < 1e-12


def test_formatted_report_surface(fact):
    tables = report.business_report(fact, formatted=True)
    sport = tables["streaming_by_sport"].collect()
    assert all(isinstance(r["total_streams"], str) for r in sport)
    markets = {r["country_id"]: r["market_share"] for r in tables["top_markets"].collect()}
    assert all(v.endswith("%") for v in markets.values())
    yoy = tables["yoy_growth"].collect()
    assert yoy[0]["yoy_growth"] == "-"  # reference prints '-' for year one
