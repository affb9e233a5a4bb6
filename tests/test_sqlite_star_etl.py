"""The reference's FULL extract→transform→load path with a REAL SQLite
extract leg: operational store (SQLite file) → sources/sqlite.read_sqlite
(sharded, pushdown at the adapter) → plans/star.run_etl → retention
accounting — loadAnalyticsDB.PractII.VarmaA.R end-to-end, where
test_golden_funnel.py starts from in-memory frames and
test_sqlite_extract.py stops at the extract boundary.

Scale note: run at 40K rows (the golden replica pins the published
1.18M-row scale separately); the point here is the SEAM — the ETL's
input flowing through executor-side sqlite3 connections, with the
same funnel accounting as the planted corpus.
"""

import sqlite3

import pandas as pd
import pytest

from sportstv_streaming_data_warehouse_spark.plans import star
from sportstv_streaming_data_warehouse_spark.sources.sqlite import read_sqlite

from .fixtures_ref import RECOVERABLE, UNRECOVERABLE, generate

N_SQLITE = 36_000
N_CSV = 4_000


@pytest.fixture(scope="module")
def corpus():
    return generate(n_sqlite=N_SQLITE, n_csv=N_CSV)


@pytest.fixture(scope="module")
def db_path(corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ops") / "operational.db")
    with sqlite3.connect(path) as con:
        corpus["streaming_txns"].to_sql("streaming_txns", con, index=False)
    return path


@pytest.mark.slow
def test_star_etl_from_real_sqlite_extract(spark, corpus, db_path):
    # the reference's extract (etl.R:321-326 column list), sharded
    # across 8 executor tasks instead of the LIMIT/OFFSET loop
    txns = read_sqlite(
        spark, db_path, "streaming_txns",
        columns=[
            "transaction_id", "user_id", "asset_id",
            "streaming_date", "minutes_streamed", "completed",
        ],
        partition_column="transaction_id",
        lower_bound=1, upper_bound=N_SQLITE, num_partitions=8,
    )
    sdfs = {
        k: spark.createDataFrame(v)
        for k, v in corpus.items()
        if k != "streaming_txns"
    }
    etl = star.run_etl(
        spark,
        streaming_txns=txns,
        csv_txns=sdfs["csv_txns"],
        subscribers=sdfs["subscribers"],
        postal2city=sdfs["postal2city"],
        cities=sdfs["cities"],
        countries=sdfs["countries"],
        assets=sdfs["assets"],
    )

    # planted ground truth, recomputed in pandas independent of both the
    # SQLite leg and every Spark codepath under test
    allt = pd.concat(
        [
            corpus["streaming_txns"][
                ["transaction_id", "asset_id"]
            ],
            corpus["csv_txns"][["transaction_id", "asset_id"]],
        ],
        ignore_index=True,
    )
    prefix = allt["asset_id"].str.split("-").str[0]
    n_dropped = int(prefix.isin(UNRECOVERABLE).sum())
    n_recovered = int(prefix.isin(RECOVERABLE).sum())

    v = star.validate_fact(etl["fact"], len(allt))
    assert v["fact_rows_represented"] == len(allt) - n_dropped
    assert v["rows_dropped"] == n_dropped
    assert n_recovered > 0 and v["null_keys_ok"] and v["week_range_ok"]
