"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point, testable on local[N]:

- AQE on (runtime coalescing + skew-join splitting — the north rule
  names "AQE shuffle tuning" explicitly).
- Arrow on (every Python crossing is a vectorized batch, never a row).
- UTC session timezone (parity with DuckDB oracle comparisons).
- shuffle partitions ~ cores locally; on a real cluster this is
  overridden by ``spark.sql.adaptive.coalescePartitions`` anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kg-construct",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cpus`` controls local parallelism (``local[cpus]``); the bench
    harness uses this to evidence N→4N scaling efficiency on the same
    input (BASELINE.json north_rule).
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = SparkSession.builder.appName(app_name)
    # Respect an externally-provided master (spark-submit --master on a
    # real cluster); fall back to local[cpus] for direct python runs.
    # Probing SparkConf() pre-JVM is useless (it's an empty dict before
    # the gateway exists), so detect spark-submit by the env vars
    # PythonRunner sets when IT launches the driver python process.
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ or "SPARK_CONNECT_MODE_ENABLED" in os.environ
    if not submitted:
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # managed tables (bucketed-corpus demo) land in /tmp, not cwd
        .config("spark.sql.warehouse.dir", os.environ.get(
            "SPARK_GRAFT_WAREHOUSE_DIR", "/tmp/kg_spark_warehouse"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
