import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "txn_count" in df.columns


def test_queries_oracles_aligned():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 60


def test_flagship_runs_at_every_sf(spark):
    # the driver smokes sf0.001, verifies at sf0.01, benches at sf0.1 —
    # the flagship must produce rows at all three
    q = entrymod.queries()["flagship_daily_rollup"]
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        assert q(spark, f"/root/testdata/{sf}").limit(1).count() == 1, sf
