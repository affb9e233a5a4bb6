"""Skew mitigation: salting for hot keys (SURVEY.md 'Partitioning &
shuffle' — skewed keys hurt).

AQE's skew-join splitting (enabled in session.py) handles sort-merge
joins automatically; these helpers cover the remaining cases:

- salted_aggregate: a hot GROUP BY key concentrates a whole shuffle
  partition on one task. Salting splits each key into n sub-keys for the
  partial phase, then reduces the (tiny) per-salt partials — two small
  exchanges instead of one pathological one. Valid for ALGEBRAIC
  aggregates (sum/count/min/max); exact countDistinct cannot be salted
  this way (its merge isn't additive) — use approx_count_distinct, whose
  HLL sketches DO merge.
- salted_join: replicates the small side n times (one copy per salt) and
  hash-salts the big side deterministically, so a hot join key spreads
  over n tasks.

Salts derive from xxhash64 of stable row identity — deterministic, so
results are reproducible run to run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted rollup: count(*) + sum(sum_cols) per group key.

    Phase 1 groups by (keys, salt) — the hot key's rows spread across
    n_salts tasks; phase 2 reduces n_salts partials per key.
    """
    salt = F.pmod(F.xxhash64(salt_from), F.lit(n_salts)).alias("__salt")
    partial = df.withColumn("__salt", salt).groupBy(*group_cols, "__salt").agg(
        F.count("*").alias("__cnt"),
        *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__cnt").alias("n"),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where `big` has hot values of `on`: big rows get a
    deterministic salt, small rows are replicated once per salt, and the
    join key becomes (on, salt) — the hot key now lands on n_salts tasks.

    Use when the small side is too big to broadcast but small enough to
    replicate n_salts times (cost: n_salts x |small| shuffle volume).
    """
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_from), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))),
    )
    return big_s.join(small_s, on=[on, "__salt"]).drop("__salt")
