"""Sink / table-lifecycle operators (SURVEY section 2.1, S8-S13)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from callio_etl_spark.io import (
    delete_rows_between,
    load_append,
    load_truncate,
    write_partitioned,
)


def test_append_with_schema_evolution(spark, tmp_path):
    p = str(tmp_path / "t")
    load_append(spark.createDataFrame([(1, "a")], "id long, x string"), p)
    # S8: later batch adds a column (ALLOW_FIELD_ADDITION)
    load_append(spark.createDataFrame([(2, "b", 9.5)], "id long, x string, y double"), p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r["id"]: r for r in df.collect()}
    assert set(df.columns) == {"id", "x", "y"}
    assert rows[1]["y"] is None and rows[2]["y"] == 9.5


def test_truncate_replaces(spark, tmp_path):
    p = str(tmp_path / "t")
    load_append(spark.createDataFrame([(1,)], "id long"), p)
    load_truncate(spark.createDataFrame([(2,), (3,)], "id long"), p)
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == [2, 3]


def test_partitioned_write_layout(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a", "2024-01-01", 1), ("b", "2024-01-02", 2)], "tenant string, d string, v long"
    ).withColumn("d", F.col("d").cast("date"))
    write_partitioned(df, p, "d", cluster_cols=["tenant"])
    # S12 / section 1.4: hive-style day partition directories exist
    assert os.path.isdir(f"{p}/d=2024-01-01") and os.path.isdir(f"{p}/d=2024-01-02")
    # partition pruning: reading one day touches one directory
    one = spark.read.parquet(p).where(F.col("d") == "2024-01-01")
    assert [r["tenant"] for r in one.collect()] == ["a"]
    files = [f for r in one.select(F.input_file_name()).distinct().collect() for f in r]
    assert all("d=2024-01-01" in f for f in files)


def test_delete_rows_between(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(10).withColumn("v", F.col("id") * 2).write.parquet(p)
    delete_rows_between(spark, p, "id", 3, 6)  # S11: staging-window cleanup
    left = sorted(r["id"] for r in spark.read.parquet(p).collect())
    assert left == [0, 1, 2, 7, 8, 9]
