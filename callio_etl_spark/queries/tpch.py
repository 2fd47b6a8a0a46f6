"""TPC-H classic query shapes over the driver's star schema.

The reference's one analytical query (SURVEY.md section 3.3) is a two-branch
join-aggregate; this module adapts ALL 22 canonical TPC-H shapes to the
columns the testdata actually has — scan-heavy aggregate (Q1/Q6), join +
top-k (Q3/Q10/Q18/Q21), snowflake joins (Q5/Q7/Q8/Q9), decorrelated
correlated subqueries (Q2/Q4/Q11/Q15/Q17/Q20/Q22), disjunctive-predicate
join (Q19), outer-join distribution (Q13), conditional shares (Q8/Q12/Q14),
and distinct-count with NOT IN (Q16). Where the testdata lacks a column
(partsupp table, l_shipmode, l_commitdate/l_receiptdate, c_phone,
p_container) the query keeps the SHAPE and substitutes the nearest
available semantics; each docstring names the substitution.

Oracle parity: money sums through DECIMAL(38,6) (order-independent exact),
top-k with unique-key tiebreakers, EXTRACT(year) cast BIGINT both sides,
threshold compares in double with the identical expression on both engines
(registry rules).
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


# ---------------------------------------------------------------------------
# Q2/Q9/Q11/Q16/Q20 need TPC-H's partsupp table, which the testdata does not
# ship. A deterministic stand-in is derived from lineitem: one row per
# observed (partkey, suppkey) pair, supplycost = MIN(l_extendedprice) (exact
# under parallel min — no accumulation-order issues, unlike avg). The oracle
# derives the identical table in a CTE, so both engines see the same
# "catalog". At 100 TB this derivation is one map-side-combinable grouped
# aggregate, reused via localCheckpoint when a query needs it twice.
# ---------------------------------------------------------------------------

SUPPLY_CTE = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
"""


def _supply_pairs(li: DataFrame) -> DataFrame:
    """Derived partsupp: (partkey, suppkey, supplycost=min line price)."""
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min("l_extendedprice").alias("ps_supplycost"))


Q2_REGION = "EUROPE"
Q2_TYPE = "STANDARD"
Q2_SIZE_LO, Q2_SIZE_HI = 10, 15


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
WITH ps AS ({SUPPLY_CTE}),
eligible AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, s.s_acctbal, s.s_name, n.n_name
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{Q2_REGION}'
),
best AS (
  SELECT ps_partkey, MIN(ps_supplycost) AS min_cost FROM eligible GROUP BY 1
)
SELECT e.s_acctbal, e.s_name, e.n_name, e.ps_partkey AS p_partkey,
       e.ps_supplycost AS supplycost
FROM eligible e
JOIN best b ON b.ps_partkey = e.ps_partkey AND e.ps_supplycost = b.min_cost
JOIN part p ON p.p_partkey = e.ps_partkey
WHERE p.p_type = '{Q2_TYPE}' AND p.p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
""",
    tags=["tpch", "subquery", "join"],
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier: the correlated MIN subquery decorrelated
    into a grouped-min + equi-join-back — one shuffle of the derived supply
    table, every dimension broadcast. The region filter lands BEFORE the
    per-part min, so the min is taken over eligible suppliers only (the
    spec's semantics). supplycost equality is exact (MIN of stored doubles,
    no arithmetic)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == Q2_TYPE)
        & F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI)
    )
    eligible = (
        _supply_pairs(li)
        .join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    ).localCheckpoint(eager=True)  # reused on both sides of the min-join
    best = eligible.groupBy(F.col("ps_partkey").alias("b_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    e = eligible.alias("e")
    return (
        e.join(
            best,
            (F.col("e.ps_partkey") == F.col("b_partkey"))
            & (F.col("e.ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("e.ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("e.ps_partkey").alias("p_partkey"),
            F.col("e.ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"
Q8_SHARE_NATION = "NATION_2"


@register(
    "tpch_q8_market_share",
    oracle=f"""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = '{Q8_SHARE_NATION}'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS mkt_share
FROM lineitem l
JOIN orders o   ON o.o_orderkey  = l.l_orderkey
JOIN customer c ON c.c_custkey   = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey  = n1.n_regionkey
JOIN supplier s ON s.s_suppkey    = l.l_suppkey
JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
JOIN part p     ON p.p_partkey    = l.l_partkey
WHERE r.r_name = '{Q8_REGION}' AND p.p_type = '{Q8_TYPE}'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_year
""",
    tags=["tpch", "join", "aggregate"],
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: one supplier nation's slice of regional
    PROMO-part revenue per year. Seven-table star — every dimension
    broadcast, so the only shuffle is the final ~2-row aggregate; the
    conditional numerator and the total ride the SAME aggregate (no second
    pass). Share = decimal-exact sums divided in double with the identical
    expression on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    s = load_table(spark, sf_dir, "supplier")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == Q8_TYPE)
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    zero = F.lit(0).cast(DEC)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == Q8_SHARE_NATION, vol).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


Q9_NAME_FRAGMENT = "red"
Q9_COST_PER_UNIT = 0.1  # supplycost is a full-line price; scale to per-unit


@register(
    "tpch_q9_profit",
    oracle=f"""
WITH ps AS ({SUPPLY_CTE})
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - ps.ps_supplycost * {Q9_COST_PER_UNIT} * l.l_quantity
                     AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%{Q9_NAME_FRAGMENT}%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN ps         ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
GROUP BY nation, o_year
""",
    tags=["tpch", "join", "aggregate"],
)
def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit: revenue minus supply cost for parts whose
    name contains a fragment, by supplier nation and order year. The
    derived supply table joins back to lineitem on its (partkey, suppkey)
    grain — at scale that is the one real shuffle (lineitem vs grouped
    lineitem, same key, AQE-coalesced); part/supplier/nation broadcast and
    the name LIKE prunes the part build side first. Profit is composed in
    DECIMAL before summing so both engines agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q9_NAME_FRAGMENT)
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    ps = _supply_pairs(li)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * Q9_COST_PER_UNIT * F.col("l_quantity")
    ).cast(DEC)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            ps,
            (li.l_partkey == F.col("ps_partkey"))
            & (li.l_suppkey == F.col("ps_suppkey")),
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


Q11_NATIONS = ("NATION_2", "NATION_7")
Q11_FRACTION = 0.001


@register(
    "tpch_q11_important_stock",
    oracle=f"""
WITH val AS (
  SELECT l.l_partkey AS partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS value_dec
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('{Q11_NATIONS[0]}', '{Q11_NATIONS[1]}')
  GROUP BY 1
)
SELECT v.partkey, CAST(v.value_dec AS DOUBLE) AS part_value
FROM val v, (SELECT SUM(value_dec) AS total FROM val) t
WHERE CAST(v.value_dec AS DOUBLE) > CAST(t.total AS DOUBLE) * {Q11_FRACTION}
ORDER BY part_value DESC, partkey
""",
    tags=["tpch", "subquery", "aggregate"],
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: per-part inventory value within two supplier
    nations, kept only where it exceeds a fraction of the GLOBAL total —
    the HAVING-against-scalar-subquery shape. The per-part aggregate is
    computed once (localCheckpoint), the global total is a 1-row
    re-aggregate of it broadcast back via cross join — no second lineitem
    scan. Threshold compare in double with the identical expression on
    both engines (exact decimal sums underneath)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin(*Q11_NATIONS)
    )
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("value_dec"))
    ).localCheckpoint(eager=True)  # reused: per-part rows + global total
    total = val.agg(F.sum("value_dec").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(
            F.col("value_dec").cast("double")
            > F.col("total").cast("double") * Q11_FRACTION
        )
        .select("partkey", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "partkey")
    )


Q12_LATE_DAYS = 90
Q12_HIGH = ("1-URGENT", "2-HIGH")


@register(
    "tpch_q12_late_lines",
    oracle=f"""
SELECT l.l_returnflag AS ret_flag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('{Q12_HIGH[0]}', '{Q12_HIGH[1]}')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('{Q12_HIGH[0]}', '{Q12_HIGH[1]}')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY ret_flag
""",
    tags=["tpch", "join", "aggregate"],
)
def tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 late-shipment priority split, adapted to the available columns:
    the testdata carries no l_shipmode/l_receiptdate, so 'mode' is
    l_returnflag and 'late' is shipped > {Q12_LATE_DAYS} days after the
    order date (a cross-table date comparison, evaluated post-join like
    the spec's receipt/commit check). Both CASE counters ride one
    aggregate; the orders year filter is pushed to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")
        )
        .groupBy(F.col("l_returnflag").alias("ret_flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE_PREFIX = "PROMO"
Q16_SIZES = (1, 5, 10, 15, 20, 25, 30, 35)
Q16_BAD_BAL = 500.0


@register(
    "tpch_q16_supplier_count",
    oracle=f"""
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs pr
JOIN part p ON p.p_partkey = pr.l_partkey
WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
  AND p.p_type NOT LIKE '{Q16_EXCL_TYPE_PREFIX}%'
  AND p.p_size IN {Q16_SIZES}
  AND pr.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < {Q16_BAD_BAL}
      )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    tags=["tpch", "aggregate", "subquery"],
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier count by part attributes: distinct (part, supplier)
    pairs stand in for partsupp, the spec's complaints-supplier NOT IN
    becomes a broadcast anti-join on a low-balance list (no s_comment in
    the testdata). COUNT(DISTINCT suppkey) expands to the usual two-phase
    partial-distinct aggregate; the excluded-supplier list is tiny and
    broadcast, never shuffled."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & ~F.col("p_type").startswith(Q16_EXCL_TYPE_PREFIX)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < Q16_BAD_BAL
    ).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q20_NATION = "NATION_3"
Q20_NAME_PREFIX = "red"
Q20_MIN_QTY = 50


@register(
    "tpch_q20_promotion_suppliers",
    oracle=f"""
WITH shipped AS (
  SELECT l.l_suppkey, l.l_partkey,
         SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '{Q20_NAME_PREFIX}%'
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = '{Q20_NATION}'
WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > {Q20_MIN_QTY})
ORDER BY s_name
""",
    tags=["tpch", "subquery"],
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 promotion-eligible suppliers: the nested-IN chain (suppliers →
    heavy shippers of prefix-named parts in a year) as a broadcast semi
    join. The grouped HAVING qty > {Q20_MIN_QTY} runs on the lineitem
    side first — the semi join's build side is a few supplier keys, so
    the 100-supplier dimension never shuffles. Quantity threshold in
    exact DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith(Q20_NAME_PREFIX)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == Q20_NATION)
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .where(F.col("qty") > Q20_MIN_QTY)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q21_NATION = "NATION_1"
Q21_LATE_DAYS = 60
Q21_TOPK = 20


@register(
    "tpch_q21_waiting_orders",
    oracle=f"""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey AND n.n_name = '{Q21_NATION}'
WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
  AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT {Q21_TOPK}
""",
    tags=["tpch", "join", "subquery", "topk"],
)
def tpch_q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting: late lines (shipped >
    {Q21_LATE_DAYS} days after ordering, finished orders) where ANOTHER
    supplier shares the order (EXISTS → left_semi) but NO OTHER supplier
    was also late (NOT EXISTS → left_anti). Lateness adapts the spec's
    receipt-vs-commit check to the available dates. Both (in)equality
    semi/anti joins are equi on l_orderkey with the supplier inequality
    as a residual — hash joins, not nested loops; the late set is
    localCheckpointed because it appears on both sides of the anti join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    ).localCheckpoint(eager=True)  # l1 and l3 are the same relation
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == Q21_NATION)
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(Q21_TOPK)
    )


Q22_CODES = ("00", "11", "22", "33", "44", "55", "66")
Q22_INACTIVE_CUTOFF = "2000-01-01"


@register(
    "tpch_q22_opportunity",
    oracle=f"""
WITH cust AS (
  SELECT c_custkey, c_acctbal, right(c_name, 2) AS cntrycode
  FROM customer
  WHERE right(c_name, 2) IN {Q22_CODES}
),
avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS a
  FROM cust WHERE c_acctbal > 0.0
)
SELECT c.cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM cust c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{Q22_INACTIVE_CUTOFF} 00:00:00'
      )
GROUP BY c.cntrycode
ORDER BY c.cntrycode
""",
    tags=["tpch", "subquery", "aggregate"],
)
def tpch_q22_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity: above-average-balance customers with
    no RECENT orders (the testdata has no c_phone, so 'country code' is
    the customer-name suffix, and — every customer having ordered at
    least once — 'never ordered' becomes 'not since {Q22_INACTIVE_CUTOFF}').
    Scalar-subquery average broadcast via cross join, anti join against
    the pruned recent-orders scan; the customer scan happens once
    (localCheckpoint) and feeds both the average and the output."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.right(F.col("c_name"), F.lit(2)).isin(*Q22_CODES))
        .select(
            "c_custkey",
            "c_acctbal",
            F.right(F.col("c_name"), F.lit(2)).alias("cntrycode"),
        )
    ).localCheckpoint(eager=True)  # feeds the average AND the final agg
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")
        ).alias("a")
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate")
        >= F.lit(f"{Q22_INACTIVE_CUTOFF} 00:00:00").cast("timestamp")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
