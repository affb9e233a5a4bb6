"""The frequent-token cap (max_token_docs) is what makes exact
token-Jaccard 100 TB-safe — without it the inverted-index self-join is
quadratic in stop-token document frequency. At the catalog's sf0.01
settings the cap is inactive (2000 > 500 docs), so this test runs it IN
ANGER: a cap that really drops tokens, with a DuckDB oracle computing
the same capped semantics."""

import duckdb

from sportstv_streaming_data_warehouse_spark.operators.dedup import (
    token_jaccard_pairs,
)
from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table

from .conftest import SF01

CAP = 390
ORACLE = rf"""
WITH toks0 AS (
  SELECT DISTINCT doc_id AS doc, tok
  FROM documents, UNNEST(list_filter(regexp_split_to_array(text, '\s+'), t -> t != '')) AS u(tok)
),
freq AS (SELECT tok, COUNT(*) AS c FROM toks0 GROUP BY 1),
toks AS (SELECT doc, tok FROM toks0 JOIN freq USING (tok) WHERE c <= {CAP}),
sizes AS (SELECT doc, COUNT(*) AS n_tok FROM toks GROUP BY doc),
inter AS (
  SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       inter / CAST(sa.n_tok + sb.n_tok - inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc = id_a
JOIN sizes sb ON sb.doc = id_b
WHERE inter / CAST(sa.n_tok + sb.n_tok - inter AS DOUBLE) >= 0.5
"""


def test_capped_token_jaccard_matches_capped_oracle(spark):
    docs = load_table(spark, SF01, "documents")
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in token_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, max_token_docs=CAP
        ).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in token_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, max_token_docs=None
        ).collect()
    }
    assert capped != uncapped, "cap must actually change the result here"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF01}/documents.parquet'"
    )
    want = {(a, b): j for a, b, j in con.execute(ORACLE).fetchall()}
    assert set(capped) == set(want)
    for k, v in want.items():
        assert capped[k] == v, (k, capped[k], v)
