"""The banded-dedup bucket-size cap (max_bucket_size) is the quadratic
guard for dup-heavy corpora — exercised IN ANGER with a cap that really
drops buckets, against a DuckDB oracle computing identical capped
semantics from the same LCG planes."""

import duckdb

from sportstv_streaming_data_warehouse_spark.operators.similarity import (
    banded_cosine_pairs,
)
from sportstv_streaming_data_warehouse_spark.plans.catalog import (
    _EC,
    _ec_capped_oracle,
)
from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table

from .conftest import SF01

CAP = 15


def _capped_oracle() -> str:
    # same builder the catalog's driver-verified query uses (cap=_EC["cap"],
    # inactive on the fixtures) — here with a cap that actually bites
    return _ec_capped_oracle(CAP)


def test_capped_banded_pairs_match_capped_oracle(spark):
    emb = load_table(spark, SF01, "embeddings")
    kw = dict(
        threshold=_EC["tau"], dim=_EC["dim"],
        planes_per_band=_EC["planes_per_band"], n_bands=_EC["n_bands"],
        seed=_EC["seed"],
    )
    capped = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in banded_cosine_pairs(emb, max_bucket_size=CAP, **kw).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in banded_cosine_pairs(emb, **kw).collect()
    }
    assert set(capped) <= set(uncapped)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF01}/embeddings.parquet'"
    )
    want = {(a, b): c for a, b, c in con.execute(_capped_oracle()).fetchall()}
    assert set(capped) == set(want)
    for k, v in want.items():
        assert capped[k] == v, (k, capped[k], v)
