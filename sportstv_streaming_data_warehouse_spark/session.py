"""SparkSession factory with scale-oriented defaults.

The reference hand-rolls memory management: 50,000-row batch loops
(loadAnalyticsDB.PractII.VarmaA.R:306,464) and 500-row bulk inserts
(etl.R:388) to keep peak RAM ~800 MB. On Spark none of that machinery
exists — the scan is partitioned, aggregation is partial+final hash-agg
with spill, and AQE re-plans partition counts / skew joins at runtime.

Defaults here are tuned so the SAME code runs on local[32] test boxes and
on a 1000-executor cluster against ~100 TB:

- AQE on (runtime coalescing + skew-join splitting): the static
  ``shuffle.partitions`` is only an upper bound pre-AQE, so a generous
  value is safe at any scale.
- ``files.maxPartitionBytes`` 128 MB: bounds per-task input so a 100 TB
  scan becomes ~800K well-sized tasks rather than a few giant ones.
- session timezone pinned to UTC so date/calendar semantics are
  deterministic and match the DuckDB oracle.
- Arrow enabled for any pandas_udf path (vectorized Python transfer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return f"local[{cpus}]"


def get_spark(
    app_name: str = "sportstv-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    # Arrow/pandas workers do many SMALL numpy ops; letting each of 32
    # python workers spin up a multi-threaded BLAS pool oversubscribes
    # the box ~32x and turns microsecond matmuls into lock convoys.
    # Workers inherit the driver env in local mode — pin BLAS to 1
    # thread per worker (parallelism comes from Spark tasks, not BLAS).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or _default_master())
        # local mode runs driver+executors in ONE JVM whose default heap
        # is 1g — far under what 32 concurrent tasks need; on a cluster
        # this maps to ordinary per-executor memory sizing
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
