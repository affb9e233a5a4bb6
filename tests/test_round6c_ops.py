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
