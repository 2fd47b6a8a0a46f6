"""SparkSession factory + runtime configuration.

The driver may hand us an already-built SparkSession (``__spark_entry__.entry``),
so everything the engine depends on must be settable at runtime: ``configure``
applies those confs idempotently. ``get_spark`` builds a local session for
tests/bench with the same settings.

Scale notes (100 TB): AQE is on so skewed shuffle partitions get split and
sort-merge joins demote to broadcast at runtime; shuffle partition count is
sized to cores locally but is expected to be overridden (or AQE-coalesced) on a
real cluster. Session timezone is pinned to UTC so day-bucketing expressions
are explicit (`from_utc_timestamp`) rather than dependent on cluster locale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs the engine relies on. nanosAsLong is required to scan
#: the driver's `events.parquet` (INT64 TIMESTAMP(NANOS) — Spark has no nanos
#: timestamp type); tables.load_events() converts the long back to a timestamp.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — session default must suffice
    return spark


def get_spark(app_name: str = "callio-etl-spark", cpus: int | None = None) -> SparkSession:
    """Local session for tests/bench. Honors SPARK_GRAFT_CPUS (default 32)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
