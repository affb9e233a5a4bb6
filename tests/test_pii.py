"""PII scrubbing for training corpora: emails/phones/URLs/IPs are
removed, clean text is untouched, and the audit counts match."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.functions.text import (
    pii_counts,
    redact_pii,
)


def test_redaction_and_counts(spark):
    rows = [
        (1, "contact me at alice@example.com or bob.smith+x@mail.co.uk thanks"),
        (2, "call +49 (30) 1234-5678 today"),
        (3, "see https://example.com/path?q=1 and http://a.b/c"),
        (4, "server at 192.168.0.1 responded"),
        (5, "perfectly clean text with no identifiers"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = df.select(
        "id",
        redact_pii(F.col("text")).alias("clean"),
        *[c.alias(k) for k, c in pii_counts(F.col("text")).items()],
    )
    got = {r["id"]: r for r in out.collect()}

    assert got[1]["email"] == 2
    assert "alice@example.com" not in got[1]["clean"]
    assert got[1]["clean"].count("[PII]") == 2

    assert got[2]["phone"] == 1 and "[PII]" in got[2]["clean"]
    assert got[3]["url"] == 2 and "example.com" not in got[3]["clean"]
    assert got[4]["ipv4"] == 1 and "192.168.0.1" not in got[4]["clean"]

    assert got[5]["clean"] == rows[4][1]  # untouched
    assert all(got[5][k] == 0 for k in ("email", "phone", "url", "ipv4"))
