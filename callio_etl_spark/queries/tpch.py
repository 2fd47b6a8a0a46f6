"""TPC-H classic query shapes over the driver's star schema.

The reference's one analytical query (SURVEY.md section 3.3) is a two-branch
join-aggregate; these three add the canonical multi-join analytics shapes a
replacement engine gets asked for on day one, adapted to the columns the
testdata actually has:

- ``tpch_q1_pricing``   scan-heavy single-table aggregate (Q1): the widest
  measure set, all map-side-combinable, one shuffle of 4 grouped rows per
  partition. The classic whole-stage-codegen throughput test.
- ``tpch_q3_topk``      3-way join + aggregate + top-k (Q3): selective dim
  filter first, join order smallest-first, TakeOrderedAndProject for the
  limit — never a global sort.
- ``tpch_q5_volume``    5-way snowflake join (Q5): region -> nation ->
  (customer, supplier) -> orders -> lineitem with the Q5 twist that the
  customer and supplier must share a nation. Dims broadcast; only
  orders⋈lineitem shuffles.

Oracle parity: money sums through DECIMAL(38,6) (order-independent exact),
top-k with unique-key tiebreakers (registry rules).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table

DEC = "decimal(38,6)"
Q1_CUTOFF = "1998-09-02"
Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1995-03-15"
Q5_REGION = "ASIA"
TOPK = 10


@register(
    "tpch_q1_pricing",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)      AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE)
         AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)      AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=["tpch", "aggregate"],
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: one scan, one partial+final hash aggregate over
    ~4 groups — at 100 TB the shuffle moves a handful of rows per task; the
    whole cost is the codegen'd scan, and the shipdate filter is pushed to
    parquet (min/max row-group skipping)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit(f"{Q1_CUTOFF} 00:00:00").cast("timestamp")
    )
    p, d, t, q = (
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_tax"),
        F.col("l_quantity"),
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(q.cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(p.cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum((p * (1 - d)).cast(DEC)).cast("double").alias("sum_disc_price"),
            F.sum((p * (1 - d) * (1 + t)).cast(DEC)).cast("double").alias("sum_charge"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            (F.col("sum_qty") / F.col("n")).alias("avg_qty"),
            (F.col("sum_base_price") / F.col("n")).alias("avg_price"),
            F.col("n").cast("long").alias("count_order"),
        )
    )


@register(
    "tpch_q3_topk",
    oracle=f"""
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF} 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '{Q3_CUTOFF} 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT {TOPK}
""",
    tags=["tpch", "join", "topk"],
)
def tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping-priority top-{TOPK}: selective filters first, then
    customer⋈orders on custkey and the survivors into lineitem on orderkey
    — both shuffle joins by design (customer and orders scale with the
    fact tables, so a broadcast hint would be a 100 TB lie; AQE converts
    to broadcast at small SF where the filtered sides fit). The limit
    plans as TakeOrderedAndProject — per-partition heaps, no global sort.
    Tiebreak on the unique l_orderkey keeps the cut deterministic."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(f"{Q3_CUTOFF} 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(f"{Q3_CUTOFF} 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            o.join(c, o.o_custkey == c.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(TOPK)
    )


@register(
    "tpch_q5_volume",
    oracle=f"""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = '{Q5_REGION}'
GROUP BY n.n_name
""",
    tags=["tpch", "join", "snowflake"],
)
def tpch_q5_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: the 6-table snowflake with the
    same-nation customer/supplier condition. Only the FIXED-cardinality
    dims (region: 5 rows, nation: 25) get broadcast hints — customer,
    supplier, orders and lineitem all scale with the dataset, so their
    joins shuffle on their keys and AQE demotes to broadcast where a
    filtered side happens to fit. The s_nationkey = c_nationkey conjunct
    rides on the supplier join."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q5_REGION)
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    cn = (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
            .cast("double")
            .alias("revenue")
        )
    )


Q18_QTY = 300


@register(
    "tpch_q18_large_orders",
    oracle=f"""
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > {Q18_QTY}
)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
""",
    tags=["tpch", "join", "having"],
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume orders: IN over an aggregate subquery (HAVING) ->
    planned as aggregate + left-semi join, so the big lineitem table is
    aggregated ONCE to find qualifying orders and the rest of the query
    touches only those. l_quantity is integer-valued, so the HAVING
    threshold compares exactly in both engines; the output sum goes
    through DECIMAL."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > Q18_QTY)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"),
                F.col("l_orderkey") == F.col("bk"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty")
        )
    )


Q6_YEAR_START = "1994-01-01"
Q6_YEAR_END = "1995-01-01"
Q6_DISCOUNT_LO = 0.05
Q6_DISCOUNT_HI = 0.07
Q6_QTY = 24


@register(
    "tpch_q6_forecast",
    oracle=f"""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR_START} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q6_YEAR_END} 00:00:00'
  AND l_discount BETWEEN {Q6_DISCOUNT_LO} AND {Q6_DISCOUNT_HI}
  AND l_quantity < {Q6_QTY}
""",
    tags=["tpch"],
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — the pure filter-scan aggregate: every predicate pushes to the
    parquet scan (shipdate range + discount band + quantity), the aggregate
    is a single global DECIMAL sum with map-side partials, and the shuffle
    carries exactly one row per partition. The canonical predicate-pushdown
    /scan-throughput microbenchmark."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit(f"{Q6_YEAR_START} 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{Q6_YEAR_END} 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(Q6_DISCOUNT_LO, Q6_DISCOUNT_HI)
            & (F.col("l_quantity") < Q6_QTY)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(DEC))
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )


Q4_QTR_START = "1995-07-01"
Q4_QTR_END = "1995-10-01"
Q4_LATE_DAYS = 80


@register(
    "tpch_q4_priority",
    oracle=f"""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_QTR_START} 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '{Q4_QTR_END} 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY o.o_orderpriority
""",
    tags=["tpch"],
)
def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 — order-priority checking: EXISTS-correlated subquery over late
    lineitems expressed as a LEFT SEMI join (one pass over lineitem, no
    fan-out duplication of orders), then a small grouped count. The semi
    join is the decorrelation Catalyst applies to EXISTS anyway — writing
    it directly keeps the plan deterministic. 'Late' is adapted to the
    testdata's columns (it has no l_commitdate/l_receiptdate): a lineitem
    shipped more than {Q4_LATE_DAYS} days after its order date — note the
    correlation spans both the key AND the date comparison, like real Q4."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(f"{Q4_QTR_START} 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{Q4_QTR_END} 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (
                li["l_shipdate"]
                > o["o_orderdate"] + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )
