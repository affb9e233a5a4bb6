"""SCD Type-2 dimension maintenance + point-in-time enrichment.

The reference's dims are overwrite-only snapshots (truncate-reload,
loadAnalyticsDB.PractII.VarmaA.R:144-238): a subscriber who moves country
silently rewrites history. The warehouse-grade alternative keeps every
version with an [effective_from, effective_to) validity interval and
enriches facts against the version in force AT EVENT TIME.

- ``apply_scd2``: merge a batch of changed attributes into the history —
  closes the current version of changed keys and appends the new one.
  Only changed keys shuffle; unchanged history is untouched (at scale:
  partition the history by key range and this is a partial rewrite).
- ``enrich_point_in_time``: an as-of join (operators/asof.py) of events
  against version start times — correct per-event attribution without a
  range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.asof import asof_join

FAR_FUTURE = "9999-12-31 00:00:00"


def init_scd2(dim: DataFrame, key: str, attrs: list[str], effective_from) -> DataFrame:
    """Bootstrap a history from a plain snapshot."""
    return dim.select(
        key,
        *attrs,
        F.lit(effective_from).cast("timestamp").alias("effective_from"),
        F.lit(FAR_FUTURE).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )


def apply_scd2(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    change_ts,
) -> DataFrame:
    """Merge ``updates(key, attrs...)`` effective at ``change_ts``.

    Keys whose attributes actually changed get their open version closed
    at change_ts and a new current version appended; no-op updates leave
    history untouched. Keys not yet in the dimension enter as first
    versions effective at change_ts. The batch is reduced to one row per
    key first (exact duplicates collapse; conflicting same-batch updates
    reduce deterministically by max over the attribute struct).
    """
    ts = F.lit(change_ts).cast("timestamp")
    cur = history.filter(F.col("is_current"))
    upd = (
        updates.groupBy(key)
        .agg(F.max(F.struct(*attrs)).alias("__u"))
        .select(key, *[F.col(f"__u.{a}").alias(f"__new_{a}") for a in attrs])
    )

    changed_keys = (
        cur.join(upd, key)
        .filter(
            " OR ".join(f"NOT (`{a}` <=> `__new_{a}`)" for a in attrs)
        )
        .select(key, *[F.col(f"__new_{a}").alias(a) for a in attrs])
    )
    brand_new_keys = upd.join(cur.select(key), key, "left_anti").select(
        key, *[F.col(f"__new_{a}").alias(a) for a in attrs]
    )
    inserts = changed_keys.unionByName(brand_new_keys)

    closed = (
        history.join(changed_keys.select(key), key, "left_semi")
        .filter(F.col("is_current"))
        .withColumn("effective_to", ts)
        .withColumn("is_current", F.lit(False))
    )
    untouched_open = history.filter(F.col("is_current")).join(
        changed_keys.select(key), key, "left_anti"
    )
    already_closed = history.filter(~F.col("is_current"))
    new_versions = inserts.select(
        key,
        *attrs,
        ts.alias("effective_from"),
        F.lit(FAR_FUTURE).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    cols = [key, *attrs, "effective_from", "effective_to", "is_current"]
    return (
        already_closed.select(cols)
        .unionByName(closed.select(cols))
        .unionByName(untouched_open.select(cols))
        .unionByName(new_versions.select(cols))
    )


def enrich_point_in_time(
    events: DataFrame,
    history: DataFrame,
    key: str,
    event_ts: str,
    attrs: list[str],
) -> DataFrame:
    """Attach the dimension version in force at each event's timestamp:
    an as-of join on version start times (validity intervals are
    contiguous per key, so 'latest version started at-or-before the
    event' IS the in-force version)."""
    versions = history.select(key, "effective_from", *attrs)
    out = asof_join(
        events,
        versions,
        on=key,
        left_ts=event_ts,
        right_ts="effective_from",
        value_cols=attrs,
    )
    return out.withColumnsRenamed(
        {f"asof_{a}": a for a in attrs}
    ).drop("asof_ts")
