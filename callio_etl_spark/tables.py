"""Sources over the driver's synthetic testdata (SURVEY.md section 2.1).

Maps the reference's scan operators onto declarative Spark reads:

- S1/S2 incremental descending API scan  -> parquet scan + watermark filter
  (predicate pushdown replaces the reference's early-stop pagination,
  /root/reference/callio_etl/api.py:86-324)
- S3 time-slice planner -> partitioned read / partition pruning (api.py:219-230)
- S5/S6 snapshot scans -> full table reads (api.py:326-385)

Scale notes: reads stay fully declarative so Catalyst pushes filters and prunes
columns into the parquet scan; nothing here collects to the driver. The nanos
timestamp in ``events`` is scanned as a long (see session.RUNTIME_CONFS) and
converted with integer arithmetic — `ts DIV 1000` — because a double division
would lose precision above 2^53 ns (~104 days since epoch).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Small dimension tables that should always be broadcast in joins.
DIM_TABLES = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; normalizes the events nanos timestamp."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # INT64 TIMESTAMP(NANOS) read as long: truncate to micros (matches how
        # DuckDB/pyarrow surface the same column, so oracles agree).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # Parquet timestamps without isAdjustedToUTC surface as TIMESTAMP_NTZ in
    # Spark 4; normalize to TIMESTAMP (session tz is pinned UTC — same instant)
    # so time functions like unix_millis work uniformly.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Repartition a small single-file input to the session's parallelism.

    At production scale these tables arrive as thousands of parquet splits
    and per-row compute (signatures, decodes, pair scoring) is naturally
    parallel; the local testdata is one file -> one scan partition -> one
    task. One cheap round-robin shuffle restores the parallelism the real
    layout would have. Use only ahead of compute-heavy stages — results must
    be partitioning-invariant (set-valued outputs)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def load_events_since(spark: SparkSession, sf_dir: str, cutoff_ms: int) -> DataFrame:
    """S1/F1 — incremental scan with a cutoff that actually reaches the
    parquet reader. The events timestamp is scanned as a raw nanos long, so a
    filter on the *converted* column cannot push down (only IsNotNull does);
    filtering the raw long first gives a plain `ts >= literal` PushedFilter —
    the Spark analog of the reference's early-stop pagination (api.py:190-195).

    Boundary exactness: rows carry sub-microsecond nanos, and downstream
    (and DuckDB) truncate to micros. `nanos >= (cutoff_us + 1) * 1000` is
    exactly `truncate_to_micros(ts) > cutoff` — no off-by-sub-microsecond
    drift against the oracle."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        cutoff_us = cutoff_ms * 1000
        df = df.where(F.col("ts") >= (cutoff_us + 1) * 1000)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:  # already a timestamp column (e.g. re-written table)
        df = df.where(F.col("ts") > F.timestamp_millis(F.lit(cutoff_ms)))
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views so operators can also be expressed as spark.sql."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
