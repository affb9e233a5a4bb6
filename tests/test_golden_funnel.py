"""Reference-scale golden replica: run the FULL star ETL on a
reference-shaped corpus at the reference's published size (1,083,131
SQLite + 98,732 CSV = 1,181,863 rows, README.md:204-206) and pin the
retention funnel the reference publishes (README.md:195-206) as
invariants — exactly against the fixture's planted rates, and as
"97.1%-analog" bands where the reference's number depends on its
(unpublished) data distribution.

The reference's funnel: 17.15% of transactions referenced orphaned
assets (185,772 records); 161,588 recovered via prefix inference
(86.9% of orphans), 24,184 dropped (unknown prefixes), overall
retention 97.1%.  The fixture plants the same mechanism at the same
order of magnitude (fixtures_ref.make_asset: ~17% orphans, ~14.7%
recoverable / ~2.3% unrecoverable), so the ETL's accounting must equal
the planted counts EXACTLY, and the percentages must land in the
reference-analog bands.

Also pins the three README headline-table shapes (README.md:208-235):
streaming-by-sport, top-markets, year-over-year — with expected values
recomputed independently in pandas from the planted corpus.

Runtime: ~60 s (generation ~10 s + ETL over 1.18M rows). Marked `slow`;
deselect with `-m "not slow"`.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans import report, star

from .fixtures_ref import RECOVERABLE, SPORTS, UNRECOVERABLE, generate

N_SQLITE = 1_083_131
N_CSV = 98_732

CORE = ["transaction_id", "user_id", "asset_id",
        "streaming_date", "minutes_streamed", "completed"]


@pytest.fixture(scope="module")
def corpus():
    return generate(n_sqlite=N_SQLITE, n_csv=N_CSV)


@pytest.fixture(scope="module")
def planted(corpus):
    """Ground-truth accounting recomputed in pandas from the planted
    corpus — independent of every Spark codepath under test."""
    allt = pd.concat(
        [corpus["streaming_txns"][CORE], corpus["csv_txns"][CORE]],
        ignore_index=True,
    )
    prefix = allt["asset_id"].str.split("-").str[0]
    known = prefix.isin(SPORTS)
    recoverable = prefix.isin(RECOVERABLE)
    dropped = prefix.isin(UNRECOVERABLE)
    assert (known | recoverable | dropped).all(), "unclassified asset prefix"

    sport = prefix.map({**SPORTS, **RECOVERABLE})
    # user -> country through the planted snowflake: P{uid%60} -> city
    # (p%12)+1 -> country via the cities table
    cities = corpus["cities"].set_index("city_id")["country_id"]
    country = (allt["user_id"] % 60 % 12 + 1).map(cities)
    year = allt["streaming_date"].str.slice(0, 4).astype(int)

    kept = ~dropped
    return {
        "all": allt,
        "n_total": len(allt),
        "n_orphans": int((recoverable | dropped).sum()),
        "n_recovered": int(recoverable.sum()),
        "n_dropped": int(dropped.sum()),
        "by_sport": sport[kept].value_counts().to_dict(),
        "by_country": country[kept].value_counts().to_dict(),
        "by_year": year[kept].value_counts().to_dict(),
    }


@pytest.fixture(scope="module")
def etl(spark, corpus):
    sdfs = {k: spark.createDataFrame(v) for k, v in corpus.items()}
    return star.run_etl(
        spark,
        streaming_txns=sdfs["streaming_txns"],
        csv_txns=sdfs["csv_txns"],
        subscribers=sdfs["subscribers"],
        postal2city=sdfs["postal2city"],
        cities=sdfs["cities"],
        countries=sdfs["countries"],
        assets=sdfs["assets"],
    )


@pytest.mark.slow
def test_funnel_accounting_exact_and_reference_analog(etl, planted):
    """Retention funnel: exact against the planted corpus, and inside
    the reference-analog bands (97.1% retention / 86.9% recovery /
    17.15% orphan rate, README.md:195-206)."""
    v = star.validate_fact(etl["fact"], planted["n_total"])
    assert v["fact_rows_represented"] == planted["n_total"] - planted["n_dropped"]
    assert v["rows_dropped"] == planted["n_dropped"]
    assert v["week_range_ok"] and v["null_keys_ok"]

    orphan_rate = planted["n_orphans"] / planted["n_total"]
    recovery = planted["n_recovered"] / planted["n_orphans"]
    assert 0.15 <= orphan_rate <= 0.19, orphan_rate      # 17.15%-analog
    assert 0.84 <= recovery <= 0.90, recovery            # 86.9%-analog
    assert 96.5 <= v["retention_pct"] <= 98.5            # 97.1%-analog


@pytest.mark.slow
def test_streaming_by_sport_table_matches_planted(etl, planted):
    """README.md:210-216 analog: per-sport totals from the fact equal
    the planted per-sport counts (orphans counted under their inferred
    sport — the recovery path feeds the right rows to the right group)."""
    got = {
        r["sport_name"]: r["total_streams"]
        for r in report.streaming_by_sport(etl["fact"], formatted=False).collect()
    }
    assert got == planted["by_sport"]
    assert set(got) == {"Ice Hockey", "Ski Jumping", "Inline Hockey"}


@pytest.mark.slow
def test_top_markets_table_matches_planted(etl, planted):
    """README.md:218-225 analog: per-country totals + market shares."""
    rows = report.top_markets(etl["fact"], formatted=False).collect()
    got = {r["country_id"]: r["total_streams"] for r in rows}
    assert got == planted["by_country"]
    assert abs(sum(r["market_share"] for r in rows) - 1.0) < 1e-9
    # zero-subscriber countries must not appear (report.Rmd:619)
    assert 5 not in got and 6 not in got


@pytest.mark.slow
def test_yoy_growth_table_matches_planted(etl, planted):
    """README.md:227-235 analog: per-year totals and the YoY growth
    column computed over them."""
    rows = report.yoy_growth(etl["fact"], formatted=False).collect()
    got = {r["year"]: r["transactions"] for r in rows}
    assert got == planted["by_year"]
    by_year = sorted(planted["by_year"].items())
    first_year = by_year[0][0]
    assert next(r for r in rows if r["year"] == first_year)["yoy_growth"] is None
    for (y0, n0), (y1, n1) in zip(by_year, by_year[1:]):
        row = next(r for r in rows if r["year"] == y1)
        assert abs(row["yoy_growth"] - (n1 - n0) / n0) < 1e-12


@pytest.mark.slow
def test_fact_unique_users_exact_at_scale(etl, planted):
    """The reference's batch-additive unique_user_count double-counts
    across batches (report.Rmd:662); ours must stay EXACT at the full
    1.18M-row scale: no (day, country, sport) cell can report more
    unique users than transactions, nor more than the 300-user pool."""
    bad = etl["fact"].filter(
        (F.col("unique_user_count") > F.col("transaction_count"))
        | (F.col("unique_user_count") > 300)
        | (F.col("unique_user_count") < 1)
    )
    assert bad.count() == 0
