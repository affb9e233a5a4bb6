"""The banded-dedup bucket-size cap (max_bucket_size) is the quadratic
guard for dup-heavy corpora — exercised IN ANGER with a cap that really
drops buckets, against a DuckDB oracle computing identical capped
semantics from the same LCG planes."""

import duckdb

from sportstv_streaming_data_warehouse_spark.operators.similarity import (
    banded_cosine_pairs,
)
from sportstv_streaming_data_warehouse_spark.plans.catalog import _EC, _ec_sig_sql
from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table

from .conftest import SF01

CAP = 15


def _capped_oracle() -> str:
    n_bands = _EC["n_bands"]
    sigs = ", ".join(_ec_sig_sql(b) for b in range(n_bands))
    unions = "\n      UNION ALL ".join(
        f"SELECT vec_id, e, {b} AS band, s{b} AS sig FROM s"
        for b in range(n_bands)
    )
    cos = (
        "list_dot_product(a.e, b.e)"
        " / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))"
    )
    return f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    s AS (SELECT vec_id, e, {sigs} FROM v),
    u AS ({unions}),
    cnt AS (SELECT band, sig, COUNT(*) AS c FROM u GROUP BY 1, 2),
    ok AS (SELECT u.* FROM u JOIN cnt USING (band, sig)
           WHERE cnt.c > 1 AND cnt.c <= {CAP}),
    pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.e AS ae, b.e AS be
      FROM ok a JOIN ok b
        ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           list_dot_product(ae, be)
             / (sqrt(list_dot_product(ae, ae)) * sqrt(list_dot_product(be, be)))
             AS cosine_sim
    FROM pairs
    WHERE list_dot_product(ae, be)
            / (sqrt(list_dot_product(ae, ae)) * sqrt(list_dot_product(be, be)))
          >= {_EC["tau"]}
    """


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
