"""MERGE upsert semantics as oracle-checkable queries (SURVEY.md J8-J11).

Each query builds a deterministic target/source pair from `orders`, runs the
engine's merge_upsert operator, and the oracle expresses the same post-merge
state as a single SELECT (FULL OUTER + CASE arms) — the purely relational
definition of MERGE.

Scenario: the target is the warehouse snapshot (orders before 1998); the
source is an incremental batch (orders from Dec 1997 on, with re-priced rows)
— a one-month overlap exactly like the reference's late-data window (C2), so
the matched/not-matched/untouched arms are all populated.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from callio_etl_spark.merge import MergeSpec, merge_upsert
from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table

_CUT = "1998-01-01"
_OVERLAP = "1997-12-01"


def _target(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderdate") < F.lit(_CUT).cast("timestamp")).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.to_date("o_orderdate").alias("d"),
    )


def _source(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderdate") >= F.lit(_OVERLAP).cast("timestamp")).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        F.to_date("o_orderdate").alias("d"),
    )


_ORACLE_CTES = f"""
WITH t AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         CAST(o_orderdate AS DATE) AS d
  FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT} 00:00:00'
),
s AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice,
         CAST(o_orderdate AS DATE) AS d
  FROM orders WHERE o_orderdate >= TIMESTAMP '{_OVERLAP} 00:00:00'
)
"""


@register(
    "merge_upsert_full",
    oracle=_ORACLE_CTES
    + """
SELECT
  COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey      ELSE t.o_custkey      END AS o_custkey,
  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus  ELSE t.o_orderstatus  END AS o_orderstatus,
  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice   ELSE t.o_totalprice   END AS o_totalprice,
  CASE WHEN s.o_orderkey IS NOT NULL THEN s.d               ELSE t.d              END AS d
FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
""",
    tags=["J8", "J10"],
)
def merge_upsert_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — unconditional full-column MERGE (runner.py:605-728: metrics pass
    updates every column on match, inserts otherwise)."""
    spec = MergeSpec(keys=["o_orderkey"])
    return merge_upsert(_target(spark, sf_dir), _source(spark, sf_dir), spec)


@register(
    "merge_upsert_conditional",
    oracle=_ORACLE_CTES
    + """
SELECT
  COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
  CASE WHEN t.o_orderkey IS NULL THEN s.o_custkey
       WHEN s.o_orderkey IS NOT NULL AND s.o_totalprice > t.o_totalprice THEN s.o_custkey
       ELSE t.o_custkey END AS o_custkey,
  CASE WHEN t.o_orderkey IS NULL THEN s.o_orderstatus
       WHEN s.o_orderkey IS NOT NULL AND s.o_totalprice > t.o_totalprice THEN s.o_orderstatus
       ELSE t.o_orderstatus END AS o_orderstatus,
  CASE WHEN t.o_orderkey IS NULL THEN s.o_totalprice
       WHEN s.o_orderkey IS NOT NULL AND s.o_totalprice > t.o_totalprice THEN s.o_totalprice
       ELSE t.o_totalprice END AS o_totalprice,
  CASE WHEN t.o_orderkey IS NULL THEN s.d
       WHEN s.o_orderkey IS NOT NULL AND s.o_totalprice > t.o_totalprice THEN s.d
       ELSE t.d END AS d
FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
""",
    tags=["J8"],
)
def merge_upsert_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — conditional matched arm (runner.py:177-181: update only when
    row_hash differs OR updateTime newer). Here the change-detection gate is
    'source price is higher'; rows failing it keep target values."""
    spec = MergeSpec(
        keys=["o_orderkey"],
        update_condition=F.col("S.o_totalprice") > F.col("T.o_totalprice"),
    )
    return merge_upsert(_target(spark, sf_dir), _source(spark, sf_dir), spec)


@register(
    "merge_partial_keep_existing",
    oracle=_ORACLE_CTES
    + """
SELECT
  COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
  CASE WHEN t.o_orderkey IS NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
  CASE WHEN t.o_orderkey IS NULL THEN s.o_orderstatus
       WHEN s.o_orderkey IS NOT NULL THEN IFNULL(t.o_orderstatus, s.o_orderstatus)
       ELSE t.o_orderstatus END AS o_orderstatus,
  CASE WHEN t.o_orderkey IS NULL THEN s.o_totalprice
       WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
       ELSE t.o_totalprice END AS o_totalprice,
  CASE WHEN t.o_orderkey IS NULL THEN s.d ELSE t.d END AS d
FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
""",
    tags=["J11"],
)
def merge_partial_keep_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 — partial-column update with keep-existing (runner.py:856-863:
    the status pass SETs only status columns; Team/MaNV are
    IFNULL(T.x, S.x)). Here only o_totalprice is updated; o_orderstatus is
    keep-existing; o_custkey/d stay target values on match."""
    spec = MergeSpec(
        keys=["o_orderkey"],
        update_cols=["o_totalprice"],
        keep_existing=["o_orderstatus"],
    )
    return merge_upsert(_target(spark, sf_dir), _source(spark, sf_dir), spec)
