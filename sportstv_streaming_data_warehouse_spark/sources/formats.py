"""Additional source/sink formats beyond the parquet fixtures.

The reference reads exactly two formats — a SQLite full scan and chunked
CSV (loadAnalyticsDB.PractII.VarmaA.R:321-326, 479-488). A Spark
warehouse speaks every format the runtime ships; these wrappers cover
the ones usable without extra jars:

- ORC: columnar interchange with other Hive-era warehouses. Same
  predicate-pushdown / column-pruning behavior as parquet (Catalyst
  pushes into the OrcScan), so a table landed as ORC by an upstream
  system queries at parquet-like speed without conversion.
- binaryFile: whole files as (path, modificationTime, length, content)
  rows — the ingestion path for MEDIA corpora, feeding
  operators/multimodal.probe_media directly. Spark caps single files at
  spark.sql.sources.binaryFile.maxLength (int32 max); partition
  parallelism follows the file listing, so a directory of millions of
  images fans out across executors with no driver-side listing loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Declarative ORC scan — pushdown/pruning verified in tests by
    explain() containing the pushed filter."""
    return spark.read.orc(path)


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read a directory of media files as binary rows ready for
    probe_media / decode plumbing: (media_id, data, format) plus the
    source path and length.

    media_id is a deterministic hash of the file path (stable across
    runs and executors); format carries the lowercase filename extension
    as a HINT only — probe_media sniffs the real container from the
    bytes, which is the value a pipeline must trust.
    """
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("data"),
        ext.alias("format"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines ingestion with an explicit schema and quarantine
    semantics: malformed lines land whole in ``corrupt_col`` instead of
    failing the load (PERMISSIVE mode — the same clean/dirty split the
    CSV source uses, sources/fixtures.read_csv_source). The schema must
    already contain ``corrupt_col`` as a StringType field; Spark fills
    it only for rows it could not parse, so
    ``df.filter(col(corrupt_col).isNull())`` is the clean side and the
    non-null side is the audit trail. Schema-on-read with an EXPLICIT
    schema also skips the sampling inference pass — one scan, not two,
    which matters when the source is a 100-TB event dump."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read across files written under an EVOLVING schema:
    ``mergeSchema`` unions the per-file schemas (new columns appear as
    nulls in old files) instead of trusting one random footer. The merge
    costs a footer read per file — fine for a table's worth of files,
    which is why writers should still evolve additively (add nullable
    columns; never retype). Retyped columns fail the merge loudly, which
    is the correct behavior: silent coercion would corrupt downstream
    aggregates."""
    return spark.read.option("mergeSchema", "true").parquet(path)
