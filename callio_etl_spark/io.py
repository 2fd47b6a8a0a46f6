"""Sinks and table-lifecycle helpers (SURVEY.md section 2.1, S8-S13).

Reference: /root/reference/callio_etl/bigquery_service.py:265-330 (loads,
delete, DDL) and runner.py:158-209 (staging lifecycle). Spark-first mapping:

- S8  append sink with schema evolution  -> mode("append") + mergeSchema
- S9  truncate-replace sink              -> mode("overwrite")
- S10 SQL channel                        -> spark.sql
- S11 range delete                       -> overwrite with the complement
  predicate (Delta would be `DELETE WHERE`; parquet has no row deletes)
- S12 DDL bootstrap w/ partitioning      -> first write with partitionBy
- S13 staging tables                     -> temp views / staging paths

Physical layout (section 1.4): day partitioning via partitionBy(date_col);
BigQuery clustering maps to sortWithinPartitions on the cluster keys, which
gives parquet row-group min/max data skipping on those columns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def load_append(df: DataFrame, path: str, merge_schema: bool = True) -> None:
    """S8 — WRITE_APPEND with ALLOW_FIELD_ADDITION/RELAXATION
    (bigquery_service.py:276-300): parquet append; readers pass
    mergeSchema=true to see evolved columns."""
    df.write.mode("append").option("mergeSchema", str(merge_schema).lower()).parquet(path)


def load_truncate(df: DataFrame, path: str) -> None:
    """S9 — WRITE_TRUNCATE, no schema updates (bigquery_service.py:302-309)."""
    df.write.mode("overwrite").parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
    cluster_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S12 + section 1.4 — day-partitioned table with in-file clustering sort
    (bigquery_service.py:137-141, 205-210: partition on the date column,
    cluster on tenant/key). sortWithinPartitions orders rows inside each file
    so parquet row-group stats prune on the cluster keys."""
    if cluster_cols:
        df = df.sortWithinPartitions(*cluster_cols)
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def delete_rows_between(
    spark: SparkSession, path: str, field: str, start, end
) -> None:
    """S11 — DELETE WHERE f BETWEEN s AND e (bigquery_service.py:322-330;
    staging cleanup runner.py:208-209). Parquet has no row deletes, so keep
    the complement — with Delta this becomes a real `DELETE FROM`."""
    kept = spark.read.parquet(path).where(~F.col(field).between(start, end)).localCheckpoint()
    kept.write.mode("overwrite").parquet(path)


def stage_temp_view(df: DataFrame, name: str) -> str:
    """S13 — staging table as a temp view (runner.py:158-161: CREATE TEMP
    TABLE _S; bigquery_service.py:214-238: stg_customer)."""
    df.createOrReplaceTempView(name)
    return name
