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


Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE (n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
   OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}')
GROUP BY supp_nation, cust_nation, l_year
""",
    tags=["tpch", "join"],
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping: the role-playing-dimension query — nation joins
    TWICE under different roles (supplier's vs customer's nation). Both
    nation sides broadcast (25 rows, fixed cardinality at any SF); the
    cross-nation disjunction is applied AFTER both role joins, exactly as
    written in the spec, so Catalyst can still push each side's IN-list
    into the dim scans. orders⋈lineitem is the only at-scale shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).where(F.col("supp_nation").isin(Q7_NATION_A, Q7_NATION_B))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cust_nation").isin(Q7_NATION_A, Q7_NATION_B))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B))
            | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
            .cast("double")
            .alias("revenue")
        )
    )


Q10_QTR_START = "1996-10-01"
Q10_QTR_END = "1997-01-01"
Q10_TOPK = 20


@register(
    "tpch_q10_returned",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '{Q10_QTR_START} 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '{Q10_QTR_END} 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT {Q10_TOPK}
""",
    tags=["tpch", "join", "topk"],
)
def tpch_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: quarter filter on orders and the
    returnflag filter on lineitem BOTH push to their parquet scans before
    the orderkey shuffle join; nation broadcasts; the top-20 plans as
    TakeOrderedAndProject (per-partition heaps — no global sort of the
    grouped customers). Tiebreak on unique c_custkey for a deterministic
    cut."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(f"{Q10_QTR_START} 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{Q10_QTR_END} 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(Q10_TOPK)
    )


Q13_EXCLUDED_PRIORITY = "1-URGENT"


@register(
    "tpch_q13_order_distribution",
    oracle=f"""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c.c_custkey
) counted
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=["tpch", "join", "outer"],
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution: LEFT OUTER join with the
    filter in the JOIN CONDITION (not WHERE — customers with zero
    qualifying orders must survive with c_count = 0), a per-customer
    count, then a second tiny aggregate over the distinct counts. The
    first aggregate shuffles on c_custkey; the second moves one row per
    distinct count value. The excluded-priority predicate stands in for
    the spec's comment NOT LIKE (the testdata has no o_comment). Fully
    sorted output (small: tens of rows) with the standard tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q14_MONTH_START = "1997-03-01"
Q14_MONTH_END = "1997-04-01"


@register(
    "tpch_q14_promo",
    oracle=f"""
SELECT CAST(100.0 * SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
            AS DECIMAL(38,6)))
          / SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
       AS DOUBLE) AS promo_revenue_pct,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS total_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{Q14_MONTH_START} 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '{Q14_MONTH_END} 00:00:00'
""",
    tags=["tpch", "join"],
)
def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: conditional-aggregate ratio in ONE pass — the
    CASE rides inside the sum, so lineitem⋈part is scanned once and both
    numerator and denominator come out of the same hash aggregate (a
    single row crosses the final shuffle). part broadcasts at test SF and
    shuffles on p_partkey at 100 TB (it scales with SF); the month filter
    pushes to the lineitem scan. Ratio computed on exact DECIMAL sums,
    cast to double only at the end."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(f"{Q14_MONTH_START} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q14_MONTH_END} 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).alias("promo_rev"),
            F.sum(rev).alias("total_rev"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"))
            .cast("double")
            .alias("promo_revenue_pct"),
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


Q15_QTR_START = "1996-01-01"
Q15_QTR_END = "1996-04-01"


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_QTR_START} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q15_QTR_END} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    tags=["tpch", "subquery"],
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: a reused CTE (the per-supplier revenue aggregate)
    consumed twice — once for the rows, once for its MAX. The revenue
    frame is computed once and localCheckpoint'd so the two consumers
    don't re-run the lineitem scan; the 1-row MAX side is a broadcast
    join. Revenue equality is compared on the exact DECIMAL sums (never
    double), so ties and the max cut are engine-independent."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(f"{Q15_QTR_START} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q15_QTR_END} 00:00:00").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
            .alias("total_revenue")
        )
        .localCheckpoint(eager=False)
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(
            F.broadcast(max_rev),
            F.col("total_revenue") == F.col("max_revenue"),
        )
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


Q17_BRAND = "Brand#3"
Q17_MAX_SIZE = 5


@register(
    "tpch_q17_small_quantity",
    oracle=f"""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) / 7.0 AS DOUBLE)
         AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = '{Q17_BRAND}'
  AND p.p_size <= {Q17_MAX_SIZE}
  AND CAST(l.l_quantity AS DECIMAL(38,6)) * 5 * (
        SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      ) < (
        SELECT SUM(CAST(l2.l_quantity AS DECIMAL(38,6))) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
""",
    tags=["tpch", "subquery"],
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: the correlated per-part average
    decorrelated by hand into ONE grouped aggregate over lineitem joined
    back on partkey — Spark computes the per-part (count, sum) in a
    single shuffle instead of re-scanning lineitem per row. The spec's
    ``l_quantity < 0.2 * avg(...)`` is algebraically rearranged to
    ``5 * qty * cnt < sum`` over exact DECIMALs — no float division, so
    the boundary rows agree bit-for-bit across engines. The p_size
    predicate stands in for the spec's p_container (absent column)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == Q17_BRAND) & (F.col("p_size") <= Q17_MAX_SIZE)
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.count("*").alias("pp_cnt"),
        F.sum(F.col("l_quantity").cast(DEC)).alias("pp_sum"),
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pp_key"))
        .where(
            F.col("l_quantity").cast(DEC) * 5 * F.col("pp_cnt") < F.col("pp_sum")
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)) / 7.0)
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )


@register(
    "tpch_q19_discounted",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=["tpch", "join"],
)
def tpch_q19_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue: the disjunctive-predicate join — three OR'd
    (brand, size-band, quantity-band) arms spanning BOTH tables. Written
    as a plain equi-join on partkey with the disjunction as a post-join
    filter: Catalyst extracts the common l_quantity/p_size bounds it can
    prove (OR-expansion) and keeps the join an efficient hash join rather
    than a nested-loop over the OR. Adapted to the available columns
    (no l_shipmode/l_shipinstruct arms)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    arm1 = (br == "Brand#1") & sz.between(1, 5) & q.between(1, 11)
    arm2 = (br == "Brand#2") & sz.between(1, 10) & q.between(10, 20)
    arm3 = (br == "Brand#3") & sz.between(1, 15) & q.between(20, 30)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(arm1 | arm2 | arm3)
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )
