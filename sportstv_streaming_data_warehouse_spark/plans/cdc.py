"""Change-data-capture between two versions of a keyed table: which grain
rows were inserted, deleted, or had metric changes.

The incremental-maintenance companion (plans/star.incremental_update):
after a refresh, `diff_facts` answers "what actually changed" — for
downstream cache invalidation, audit, or publishing deltas. One
full-outer join on the grain key; change detection via null-safe
comparison of the tracked columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_facts(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Rows of (keys..., change_type, per-column old/new values) where
    change_type ∈ {inserted, deleted, updated}. Unchanged rows are
    dropped before the result materializes."""
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(True))

    joined = o.join(n, keys, "full_outer")
    in_old = F.coalesce(F.col("__in_old"), F.lit(False))
    in_new = F.coalesce(F.col("__in_new"), F.lit(False))

    changed = F.lit(False)
    for c in compare_cols:
        # null-safe inequality: NULL vs value counts as a change
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))

    change_type = (
        F.when(~in_old, F.lit("inserted"))
        .when(~in_new, F.lit("deleted"))
        .when(changed, F.lit("updated"))
    )
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .drop("__in_old", "__in_new")
    )
