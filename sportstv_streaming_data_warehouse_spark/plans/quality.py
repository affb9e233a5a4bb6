"""Declarative data-quality expectations — the reference's inline
validation stage (loadAnalyticsDB.PractII.VarmaA.R:624-753: totals
cross-check, week-range check, NULL-key check) generalized into a
reusable, single-pass framework.

Every expectation compiles to a conditional-count column expression, so
checking N expectations over 100 TB costs ONE aggregation scan — no
per-check jobs, no driver-side row iteration. Referential checks are the
exception (they need an anti-join) and say so in their cost.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    name: str
    predicate: Column  # True == row passes

    def violations(self) -> Column:
        return F.sum(F.when(~F.coalesce(self.predicate, F.lit(False)), 1).otherwise(0))


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"in_range({col},[{lo},{hi}])",
        F.col(col).isNotNull() & (F.col(col) >= lo) & (F.col(col) <= hi),
    )


def non_negative(col: str) -> Expectation:
    return Expectation(f"non_negative({col})", F.col(col) >= 0)


def accepted_values(col: str, values: list) -> Expectation:
    return Expectation(
        f"accepted_values({col})",
        F.col(col).isin(values),
    )


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(f"matches({col})", F.col(col).rlike(pattern))


@dataclass
class QualityReport:
    total_rows: int
    violations: dict[str, int] = field(default_factory=dict)
    unique_violations: dict[str, int] = field(default_factory=dict)
    orphan_counts: dict[str, int] = field(default_factory=dict)

    @property
    def passed(self) -> bool:
        return (
            all(v == 0 for v in self.violations.values())
            and all(v == 0 for v in self.unique_violations.values())
            and all(v == 0 for v in self.orphan_counts.values())
        )


def check(
    df: DataFrame,
    expectations: list[Expectation],
    unique_keys: list[list[str]] | None = None,
    references: dict[str, tuple[DataFrame, str]] | None = None,
) -> QualityReport:
    """Evaluate all expectations.

    - row expectations: ONE aggregation pass (conditional counts).
    - ``unique_keys``: one groupBy per key set (duplicate key count).
    - ``references``: {fk_col: (dim_df, pk_col)} — anti-join per FK
      (rows whose FK has no match).
    """
    aggs = [F.count("*").alias("__total")] + [
        e.violations().alias(e.name) for e in expectations
    ]
    row = df.agg(*aggs).first()
    report = QualityReport(
        total_rows=row["__total"],
        violations={e.name: int(row[e.name] or 0) for e in expectations},
    )
    for keys in unique_keys or []:
        dupes = (
            df.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)))
            .first()[0]
        )
        report.unique_violations["unique(" + ",".join(keys) + ")"] = int(dupes)
    for fk, (dim, pk) in (references or {}).items():
        orphans = df.join(
            dim.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
        ).count()
        report.orphan_counts[f"ref({fk}->{pk})"] = int(orphans)
    return report
