"""Data-quality operators: column profiling and rule-based checks.

The reference enforces correctness operationally (idempotent MERGE +
row_hash + update_log audit — SURVEY.md section 5); a standalone engine
additionally needs first-class DQ primitives, because at 100 TB you find
bad data with aggregates, not with eyeballs:

- ``profile_columns``  one-scan column profile (null / distinct / extrema /
  mean) — the input to schema-drift and anomaly alerts.
- ``dq_checks``        declarative rule results, one row per rule with its
  violation count: uniqueness, referential integrity, null-rate, range.
  The dbt-test / Deequ shape; a scheduler gates the pipeline on
  ``violations == 0``.

Both are single-pass aggregates (plus one broadcast-able anti join for the
FK check) — DQ must stay cheaper than the pipeline it guards.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table

DEC = "decimal(38,6)"


@register(
    "profile_columns",
    oracle="""
SELECT 'o_custkey'    AS col,
       CAST(COUNT(*) AS BIGINT)                         AS n_rows,
       CAST(COUNT(o_custkey) AS BIGINT)                 AS n_nonnull,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT)        AS n_distinct,
       CAST(MIN(o_custkey) AS DOUBLE)                   AS min_val,
       CAST(MAX(o_custkey) AS DOUBLE)                   AS max_val,
       CAST(SUM(CAST(o_custkey AS DECIMAL(38,6))) AS DOUBLE) / COUNT(o_custkey)
                                                        AS mean_val
FROM orders
UNION ALL
SELECT 'o_totalprice',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(o_totalprice) AS BIGINT),
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
       CAST(MIN(o_totalprice) AS DOUBLE),
       CAST(MAX(o_totalprice) AS DOUBLE),
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
         / COUNT(o_totalprice)
FROM orders
""",
    tags=["data-quality", "profiling"],
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (rows / non-null / distinct / min / max / mean) for
    two orders columns, one output row per column. Spark computes ALL
    profiles in one scan — the aggregates for every column live in the
    same HashAggregate — then unpivots to rows; the oracle spells it as a
    UNION of per-column scans (DuckDB reads the parquet twice, Spark
    once — same values)."""
    o = load_table(spark, sf_dir, "orders")

    def prof(c: str):
        col = F.col(c)
        return F.struct(
            F.lit(c).alias("col"),
            F.count("*").cast("long").alias("n_rows"),
            F.count(col).cast("long").alias("n_nonnull"),
            F.countDistinct(col).cast("long").alias("n_distinct"),
            F.min(col).cast("double").alias("min_val"),
            F.max(col).cast("double").alias("max_val"),
            (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias("mean_val"),
        )

    packed = o.agg(F.array(prof("o_custkey"), prof("o_totalprice")).alias("p"))
    return packed.select(F.explode("p").alias("s")).select("s.*")


@register(
    "dq_checks",
    oracle="""
SELECT 'customer_pk_unique' AS rule,
       CAST(COUNT(*) AS BIGINT) AS violations
FROM (
  SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1
)
UNION ALL
SELECT 'orders_custkey_fk',
       CAST(COUNT(*) AS BIGINT)
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'orders_orderdate_not_null',
       CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_orderdate IS NULL
UNION ALL
SELECT 'orders_totalprice_positive',
       CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_totalprice <= 0
""",
    tags=["data-quality", "checks"],
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DQ rules, one row per rule with its violation count:
    primary-key uniqueness (aggregate), referential integrity (anti join —
    the dim side broadcasts), not-null and range predicates (filters).
    Every rule is a tiny aggregate over one scan of its table; gate the
    pipeline on sum(violations) == 0. Adding a rule = adding a row —
    the Deequ/dbt-test operational shape."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def rule(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("rule"), F.count("*").cast("long").alias("violations")
        )

    pk_dups = (
        c.groupBy("c_custkey").agg(F.count("*").alias("n")).where(F.col("n") > 1)
    )
    orphans = o.where(F.col("o_custkey").isNotNull()).join(
        F.broadcast(c.select("c_custkey")),
        o.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    return (
        rule("customer_pk_unique", pk_dups)
        .unionByName(rule("orders_custkey_fk", orphans))
        .unionByName(rule("orders_orderdate_not_null", o.where(F.col("o_orderdate").isNull())))
        .unionByName(rule("orders_totalprice_positive", o.where(F.col("o_totalprice") <= 0)))
    )
