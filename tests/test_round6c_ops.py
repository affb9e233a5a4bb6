"""Round-6 third-batch operators: domain-mix APPLY (content-keyed
deterministic sampling) — clamp path, determinism, and the
duplicates-sample-identically property that row-id or random sampling
cannot give."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.functions import text as T
from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES

from .conftest import SF001, SF01


def test_mix_apply_invariants_and_clamp(spark):
    # rates are clamped to (0, 1]; kept counts never exceed the
    # per-source totals; and a huge-budget clamp keeps EVERYTHING
    # (checked on a planted frame where the budget dwarfs the corpus)
    rows = QUERIES["x_domain_mix_apply"](spark, SF001).collect()
    assert rows
    assert all(0.0 < r["sample_rate"] <= 1.0 for r in rows)
    from sportstv_streaming_data_warehouse_spark.sources.fixtures import (
        load_table,
    )

    per = {
        r["source"]: r["n"]
        for r in load_table(spark, SF001, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert all(r["docs_kept"] <= per[r["source"]] for r in rows)
    # clamp path: rate == 1.0 must keep every doc of that source —
    # verify via the keep predicate directly (fp % 10000 < 10000 is
    # always true, so the filter is a no-op at rate 1.0)
    docs = load_table(spark, SF001, "documents")
    kept_all = docs.filter(
        (T.fingerprint(F.col("text")) % 10000)
        < F.floor(F.lit(1.0) * 10000.0).cast("long")
    ).count()
    assert kept_all == docs.count()


def test_mix_apply_subsamples_and_is_deterministic(spark):
    a = sorted(
        (r["source"], r["docs_kept"], r["tokens_kept"])
        for r in QUERIES["x_domain_mix_apply"](spark, SF01).collect()
    )
    b = sorted(
        (r["source"], r["docs_kept"], r["tokens_kept"])
        for r in QUERIES["x_domain_mix_apply"](spark, SF01).collect()
    )
    assert a == b
    from sportstv_streaming_data_warehouse_spark.sources.fixtures import (
        load_table,
    )

    per = {
        r["source"]: r["n"]
        for r in load_table(spark, SF01, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # the budget bites at sf0.01: at least one source is subsampled
    assert any(kept < per[src] for src, kept, _ in a)


def test_duplicate_texts_sample_identically(spark):
    # two docs with identical text ALWAYS land on the same side of the
    # keep threshold regardless of doc_id — the property that prevents
    # dup-driven mix drift (and mirrors the content-hash split family)
    df = spark.createDataFrame(
        [(i, "some repeated body " * 3) for i in range(10)]
        + [(100 + i, f"unique body {i} " * 3) for i in range(10)],
        ["doc_id", "text"],
    )
    fp = df.select("doc_id", (T.fingerprint(F.col("text")) % 10000).alias("b"))
    dup_buckets = {
        r["b"] for r in fp.filter(F.col("doc_id") < 100).collect()
    }
    assert len(dup_buckets) == 1


def test_exact_median_hist_matches_native_median(spark):
    """The histogram rank-selection equals ANSI MEDIAN (DuckDB native)
    on the fixture, including even/odd group sizes on planted frames."""
    from .parity import duckdb_connection

    con = duckdb_connection(SF01)
    native = {
        r[0]: float(r[1])
        for r in con.sql(
            "SELECT event_type, MEDIAN(CAST(CAST(value AS DECIMAL(18,3))"
            "*1000 AS BIGINT)) FROM events GROUP BY 1"
        ).fetchall()
    }
    for r in QUERIES["a_exact_median_hist"](spark, SF01).collect():
        assert native[r["event_type"]] == r["median_milli"]
    con.close()

    # planted: odd group -> middle value; even group -> mean of middles;
    # heavy duplicates -> selection lands inside a run
    df = spark.createDataFrame(
        [("odd", v) for v in (5, 1, 9)]
        + [("even", v) for v in (4, 2, 8, 6)]
        + [("dup", v) for v in (3, 3, 3, 7, 9)],
        ["event_type", "value"],
    ).select("event_type", (F.col("value") / 1000.0).alias("value"))
    got = {
        r["event_type"]: (
            r["median_milli_lo"], r["median_milli_hi"], r["median_milli"]
        )
        for r in _median_on(spark, df).collect()
    }
    assert got["odd"] == (5, 5, 5.0)
    assert got["even"] == (4, 6, 5.0)
    assert got["dup"] == (3, 3, 3.0)


def _median_on(spark, ev):
    """Run the a_exact_median_hist pipeline on an arbitrary
    (event_type, value) frame."""
    from pyspark.sql import Window
    from pyspark.sql.types import DecimalType

    base = ev.select(
        "event_type",
        (F.col("value").cast(DecimalType(18, 3)) * 1000)
        .cast("long")
        .alias("m"),
    )
    hist = base.groupBy("event_type", "m").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = (
        hist.withColumn("cum", F.sum("c").over(w_cum))
        .withColumn("n", F.sum("c").over(w_all))
    )
    r_lo = F.floor((F.col("n") + 1) / 2)
    r_hi = F.floor(F.col("n") / 2) + 1
    lo = F.min(F.when(F.col("cum") >= r_lo, F.col("m")))
    hi = F.min(F.when(F.col("cum") >= r_hi, F.col("m")))
    return cum.groupBy("event_type").agg(
        lo.alias("median_milli_lo"),
        hi.alias("median_milli_hi"),
        ((lo + hi) / 2.0).alias("median_milli"),
    )
