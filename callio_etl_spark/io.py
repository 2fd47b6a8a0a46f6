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
    spark: SparkSession,
    path: str,
    field: str,
    start,
    end,
    partition_col: str | None = None,
) -> None:
    """S11 — DELETE WHERE f BETWEEN s AND e (bigquery_service.py:322-330;
    staging cleanup runner.py:208-209). Parquet has no row deletes, so keep
    the complement — with Delta this becomes a real `DELETE FROM`.

    With ``partition_col``, the rewrite is partition-scoped: only the
    partitions that actually contain in-range rows are recomputed (dynamic
    partition overwrite keeps siblings' files untouched and the table's
    layout intact), and partitions the delete empties completely are
    removed directly — dynamic overwrite can't replace a partition with
    zero rows. Without it the whole table is rewritten flat — fine for the
    reference's dim-sized staging cleanups, table-sized I/O on a fact table
    (use the partitioned form there)."""
    df = spark.read.parquet(path)
    doomed = F.col(field).between(start, end)
    if partition_col is None:
        kept = df.where(~doomed).localCheckpoint()
        kept.write.mode("overwrite").parquet(path)
        return
    # Affected-partition list: one scalar-sized collect, bounded by the
    # partition count (the same budget as any partition-pruning planner).
    affected = [
        r[0] for r in df.where(doomed).select(partition_col).distinct().collect()
    ]
    if not affected:
        return
    in_affected = F.col(partition_col).isin(affected)
    kept = df.where(in_affected & ~doomed).localCheckpoint(eager=True)
    survivors = {
        r[0] for r in kept.select(partition_col).distinct().collect()
    }
    (
        kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    # Partitions whose every row was deleted: no rows were written for
    # them, so their old files survive dynamic overwrite — drop the dirs.
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for value in set(affected) - survivors:
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/{partition_col}={value}")
        fs = p.getFileSystem(conf)
        fs.delete(p, True)


def stage_temp_view(df: DataFrame, name: str) -> str:
    """S13 — staging table as a temp view (runner.py:158-161: CREATE TEMP
    TABLE _S; bigquery_service.py:214-238: stg_customer)."""
    df.createOrReplaceTempView(name)
    return name


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (Spark's analog of co-located storage): rows
    are hash-partitioned into ``n_buckets`` files per partition by
    ``bucket_cols`` AT WRITE TIME, so joins/aggregations on those keys read
    co-located data and skip the shuffle entirely — the plan shows
    SortMergeJoin with NO Exchange on either side (asserted in
    tests/test_io.py). This is the 100 TB answer for repeated big-big joins
    on a stable key (e.g. fact-to-fact on tenant+id): pay one shuffle at
    write, never again at read."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: the skewed (large) side gets a deterministic
    salt derived from a hash of its whole row, splitting each hot key into
    ``n_salts`` shuffle partitions; the small(er) side is replicated across
    all salt values with explode. Result is row-identical to
    ``left.join(right, key, how)`` for the LEFT-PRESERVING join types only:
    because the right side is exploded n_salts times, any join that emits
    unmatched RIGHT rows (right/full outer) would emit each of them n_salts
    times — those types are rejected.

    Use when one join key dominates (AQE's skew-join split handles moderate
    skew at runtime; salting is the explicit fix when a single key exceeds
    what one task can hold). Replication multiplies the right side by
    n_salts — keep it the smaller input."""
    safe = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi",
            "left_anti", "leftanti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join: join type {how!r} would duplicate unmatched right "
            f"rows (right side is replicated {n_salts}x); supported: inner/"
            f"left/left_semi/left_anti"
        )
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(n_salts))
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return lhs.join(rhs, [key, "__salt"], how).drop("__salt")


def read_json_docs(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S1 ingestion surface for the reference's native payload shape: JSON
    docs (api.py:184's `docs` arrays land as JSON-lines files in a landing
    zone). An explicit schema keeps the read single-pass — omitting it costs
    a full inference scan, and on 100 TB of JSON that doubles the read. Mode
    PERMISSIVE + columnNameOfCorruptRecord quarantines malformed rows
    instead of failing the scan (the reference tolerates drift the same way,
    bigquery_service.py:276-284)."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV ingestion for the landing zone, same contract as read_json_docs:
    explicit schema => single-pass scan (inference reads the data twice —
    never at 100 TB), PERMISSIVE mode quarantines malformed lines into
    _corrupt_record instead of failing the job. CSV is splittable only
    without multiline quoting, so wide-cluster parallelism holds for
    line-per-record files; convert to parquet at the first hop regardless."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def compact_partition(
    spark: SparkSession,
    path: str,
    partition_col: str,
    partition_value,
    target_files: int = 1,
    cluster_cols: list[str] | None = None,
) -> int:
    """Small-file compaction for one partition — the OPTIMIZE half of table
    maintenance that incremental pipelines need at scale: every AvailableNow
    tick appends a few files per day-partition, and a year of ticks turns a
    scan into an open()-per-kilobyte exercise. Rewrites the partition into
    ``target_files`` files (re-sorted on the cluster keys so row-group
    pruning survives compaction) via dynamic partition overwrite, so sibling
    partitions are untouched. Returns the number of rows rewritten.

    Scale: one shuffle of the single partition's data; at 100 TB this runs
    per-partition (bounded work) on a schedule, never over the whole table.
    With Delta this becomes OPTIMIZE ... WHERE + ZORDER."""
    df = spark.read.parquet(path).where(F.col(partition_col) == partition_value)
    n = df.count()
    compacted = df.repartition(target_files)
    if cluster_cols:
        compacted = compacted.sortWithinPartitions(*cluster_cols)
    (
        compacted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return n
