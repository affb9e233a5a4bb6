"""Deterministic generator for the reference-shaped (A-family) tables
from FIXTURES.md §A: the SportsTV operational sources, reproducing the
semantics the ETL must handle — the subscriber→country snowflake, the
~17% orphaned asset rate with recoverable + unrecoverable prefixes
(README.md:187-198), NULL minutes/completed, and dates that straddle the
ISO-week-53 / calendar-year boundary (etl.R:81,215)."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

SEED = 42

SPORTS = {
    "DEL": "Ice Hockey",
    "SKJ": "Ski Jumping",
    "IHL": "Inline Hockey",
}
# Orphan prefixes (absent from assets): recoverable via etl.R:272-285
# rules, with the expected label under LAST-write-wins precedence.
RECOVERABLE = {
    "AHL": "Ice Hockey",
    "ICE": "Ice Hockey",
    "NLN": "Ice Hockey",
    "ICEHL": "Inline Hockey",  # matches the ICE- rule too; last rule wins
    "SKA": "Ski Jumping",
    "FIS": "Ski Jumping",
}
UNRECOVERABLE = ["OXXX", "MSL"]

COUNTRIES = [
    (1, "Deutschland"),
    (2, "Österreich"),
    (3, "Schweiz"),
    (4, "Liechtenstein"),
    (5, "Italy"),      # zero subscribers (report.Rmd:619)
    (6, "Slovakia"),   # zero subscribers
]


def generate(n_sqlite: int = 8000, n_csv: int = 2000) -> dict[str, pd.DataFrame]:
    rng = random.Random(SEED)

    countries = pd.DataFrame(COUNTRIES, columns=["country_id", "country"])

    # cities only for countries 1-4 (Italy/Slovakia must vanish from fact)
    cities = pd.DataFrame(
        [(cid, [1, 1, 1, 1, 1, 1, 2, 2, 2, 3, 3, 4][cid - 1]) for cid in range(1, 13)],
        columns=["city_id", "country_id"],
    )
    postal2city = pd.DataFrame(
        [(f"P{p:03d}", (p % 12) + 1) for p in range(60)],
        columns=["postal_code", "city_id"],
    )
    subscribers = pd.DataFrame(
        [(uid, f"P{uid % 60:03d}") for uid in range(1, 301)],
        columns=["user_id", "postal_code"],
    )

    # assets: 40 known per sport + NULL/'' sport rows (etl.R:176 filter)
    asset_rows = []
    for prefix, sport in SPORTS.items():
        for i in range(40):
            asset_rows.append((f"{prefix}-{i:04d}", sport))
    asset_rows += [("JUNK-0001", None), ("JUNK-0002", "")]
    assets = pd.DataFrame(asset_rows, columns=["asset_id", "sport"])
    known_assets = [a for a, s in asset_rows if s]

    def rand_date() -> dt.date:
        # cluster around the 2020→2021 boundary so 2021-01-01 (ISO week
        # 53 paired with calendar year 2021) occurs, plus mid-2021 dates
        if rng.random() < 0.3:
            base = dt.date(2020, 12, 28)
            return base + dt.timedelta(days=rng.randrange(10))
        base = dt.date(2021, 1, 1)
        return base + dt.timedelta(days=rng.randrange(300))

    def make_asset() -> str:
        r = rng.random()
        if r < 0.83:
            return rng.choice(known_assets)
        if r < 0.977:  # recoverable orphans
            p = rng.choice(list(RECOVERABLE))
            return f"{p}-{rng.randrange(9999):04d}"
        p = rng.choice(UNRECOVERABLE)  # ~2.3% dropped
        return f"{p}-{rng.randrange(9999):04d}"

    def make_txns(n: int, id_start: int) -> pd.DataFrame:
        rows = []
        for i in range(n):
            rows.append(
                (
                    id_start + i,
                    rng.randrange(1, 301),
                    make_asset(),
                    rand_date().isoformat(),
                    None if rng.random() < 0.02 else rng.randrange(1, 121),
                    None if rng.random() < 0.02 else rng.randrange(2),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "transaction_id", "user_id", "asset_id",
                "streaming_date", "minutes_streamed", "completed",
            ],
        )

    sqlite_txns = make_txns(n_sqlite, 1)
    # CSV ids offset past the SQLite range AT EVERY SCALE — a fixed
    # 1_000_000 start collided with SQLite ids at the golden 1.08M-row
    # scale (~83K shared transaction_ids, round-9 review finding)
    csv_core = make_txns(n_csv, n_sqlite + 1_000_000)
    # CSV superset columns (etl.R:485-487), completed arrives as string
    csv_txns = csv_core.assign(
        subscriber_id=csv_core["user_id"] + 10_000,
        streaming_start_time="12:00:00",
        device_type="web",
        quality_streamed="HD",
        completed=csv_core["completed"].map(
            lambda v: None if pd.isna(v) else str(int(v))
        ),
    )[
        [
            "transaction_id", "subscriber_id", "user_id", "asset_id",
            "streaming_date", "streaming_start_time", "minutes_streamed",
            "device_type", "quality_streamed", "completed",
        ]
    ]

    return {
        "countries": countries,
        "cities": cities,
        "postal2city": postal2city,
        "subscribers": subscribers,
        "assets": assets,
        "streaming_txns": sqlite_txns,
        "csv_txns": csv_txns,
    }
