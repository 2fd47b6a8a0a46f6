"""Correlated-subquery query shapes, expressed through spark.sql.

The reference pushes all SQL to BigQuery as text (SURVEY.md section 2.1
S10); an engine replacing it must accept the same declarative shapes and
plan them well. These three are the canonical decorrelation patterns
(TPC-H Q4 / Q16 / Q17 families). Catalyst rewrites each into a join —
EXISTS -> left semi, NOT IN -> null-aware anti, correlated scalar agg ->
aggregate + equi-join — so the physical plans are shuffle hash/broadcast
joins, not per-row subquery execution. That rewrite is exactly what makes
these runnable at 100 TB: the subquery executes once as a relation, never
once per outer row.

Views are registered per call via ``tables.register_views`` (temp views are
session-scoped; re-registration is idempotent and repoints them at the
requested scale factor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from callio_etl_spark.registry import register
from callio_etl_spark.tables import register_views

EXISTS_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS late_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""

NOT_IN_SQL = """
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS quiet_customers
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY c_nationkey
"""

# l_quantity is integer-valued, so AVG = exact-sum / count is reproducible
# across engines; the outer money sum goes through DECIMAL (registry rules).
SCALAR_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


def _sql(spark: SparkSession, sf_dir: str, sql: str, tables: list[str]) -> DataFrame:
    register_views(spark, sf_dir, tables)
    return spark.sql(sql)


@register("exists_subquery", oracle=EXISTS_SQL, tags=["subquery", "relational"])
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): orders with at least one line
    shipped after the order date. Planned as a left-semi join on
    l_orderkey — the correlated predicate l_shipdate > o_orderdate rides
    along as a join condition, no per-row subquery."""
    return _sql(spark, sf_dir, EXISTS_SQL, ["orders", "lineitem"])


@register("not_in_subquery", oracle=NOT_IN_SQL, tags=["subquery", "relational"])
def not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a subquery (Q16 family): customers with no finalized
    orders, counted per nation. Spark plans a null-aware anti join —
    semantically NOT IN is false if the subquery yields any NULL, and the
    engine must preserve that (o_custkey is non-null here, but the plan
    shape is the general one)."""
    return _sql(spark, sf_dir, NOT_IN_SQL, ["customer", "orders"])


@register("scalar_subquery", oracle=SCALAR_SQL, tags=["subquery", "relational"])
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate (Q17 shape): lines below 20% of their
    part's average quantity. Catalyst decorrelates to a per-part AVG
    aggregate joined back on l_partkey — one extra hash aggregate + one
    join instead of |lineitem| subquery executions."""
    return _sql(spark, sf_dir, SCALAR_SQL, ["lineitem", "part"])
