"""Extended function-surface suites: statistical aggregates, ordered string
aggregation, higher-order array functions, and a regexp toolkit.

The reference's function surface stops at COALESCE/CASE/regex-contains
(SURVEY.md section 2.2, P13-P14); a standalone engine needs the standard
analytics vocabulary around it. Everything here is built-in-expression only
(whole-stage codegen, no Python UDFs) and oracle-checked against DuckDB.

Determinism strategy (registry rules):
- Variance / stddev / correlation are derived from DECIMAL-accumulated raw
  moments (sum x, sum x^2, sum xy — order-independent exact sums), then the
  closed-form combination runs in double with the IDENTICAL expression on
  both engines, so the result is bit-equal. Calling each engine's built-in
  ``stddev``/``corr`` instead would compare two different accumulation
  orders and fail the 1e-9 gate on large groups.
- String aggregation sorts (or collects-then-sorts) before joining, so the
  concatenated value is order-independent.
- Array suites stay in integer arithmetic (lengths, counts) — exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table

DEC = "decimal(38,6)"
SAMPLE_K = 5  # names kept per group in string_agg_suite


@register(
    "stat_moments",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)                    AS sx,
         CAST(SUM(CAST(FLOOR(l_quantity * l_quantity * 1e6) AS DECIMAL(38,0))) AS DOUBLE) / 1e6       AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)               AS sy,
         CAST(SUM(CAST(FLOOR(l_extendedprice * l_extendedprice * 1e6) AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS syy,
         CAST(SUM(CAST(FLOOR(l_quantity * l_extendedprice * 1e6) AS DECIMAL(38,0))) AS DOUBLE) / 1e6  AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT)                                   AS n,
       sx / n                                              AS mean_qty,
       (sxx - sx * sx / n) / (n - 1)                       AS var_qty,
       sqrt((sxx - sx * sx / n) / (n - 1))                 AS stddev_qty,
       (n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
FROM m
""",
    tags=["functions", "statistics"],
)
def stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / sample variance / stddev / Pearson correlation per return
    flag, from exact DECIMAL raw moments (see module docstring for why the
    built-in stddev/corr aggregates are not oracle-comparable). Single hash
    aggregate — partial moments combine associatively, so at 100 TB this is
    one map-side-combined shuffle of six numbers per group."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")

    # Second moments floor-quantize the PRODUCT in double before the exact
    # decimal sum: a raw double->DECIMAL(38,6) cast of a 17-digit product
    # rounds through the shortest string repr in Spark but the full binary
    # expansion in DuckDB, and a tie at the 6th decimal flips the two one
    # quantum apart (observed as a last-ulp corr drift under the strict
    # bit-exact gate). floor(x*1e6) is the same double op on both engines,
    # its result is integer-valued (exact in DECIMAL(38,0) — nothing left
    # to round), and the sums stay associative/exact.
    def q6(x):
        return F.sum(F.floor(x * F.lit(1e6)).cast("decimal(38,0)")).cast(
            "double"
        ) / F.lit(1e6)

    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q.cast(DEC)).cast("double").alias("sx"),
        q6(q * q).alias("sxx"),
        F.sum(p.cast(DEC)).cast("double").alias("sy"),
        q6(p * p).alias("syy"),
        q6(q * p).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        (sx / n).alias("mean_qty"),
        ((sxx - sx * sx / n) / (n - F.lit(1.0))).alias("var_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0))).alias("stddev_qty"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
    )


@register(
    "string_agg_suite",
    oracle=f"""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT)                              AS n_customers,
       CAST(COUNT(DISTINCT c.c_mktsegment) AS BIGINT)        AS n_segments,
       string_agg(DISTINCT c.c_mktsegment, '|' ORDER BY c.c_mktsegment) AS segments,
       array_to_string((list(c.c_name ORDER BY c.c_name))[1:{SAMPLE_K}], ',') AS sample_names
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=["functions", "string-agg"],
)
def string_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation per nation: sorted-distinct segment list
    and the first {SAMPLE_K} customer names. collect_set/collect_list are
    order-nondeterministic under parallelism, so both are sorted before
    joining — the canonical way to make LISTAGG stable on a cluster. The
    nation dim is broadcast; one hash aggregate on c_nationkey."""
    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias(
                "segments"
            ),
            F.array_join(
                F.slice(F.array_sort(F.collect_list("c_name")), 1, SAMPLE_K), ","
            ).alias("sample_names"),
        )
    )


@register(
    "array_hof_suite",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT)                                        AS n_tokens,
       CAST(len(list_filter(toks, t -> len(t) > 6)) AS BIGINT)          AS n_long,
       CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT)      AS total_chars,
       CAST(len(list_distinct(toks)) AS BIGINT)                         AS n_distinct,
       array_to_string(toks[1:3], ' ')                                  AS head3
FROM t
""",
    tags=["functions", "higher-order"],
)
def array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over tokenized text: filter (lambda
    predicate), transform+aggregate (map-reduce inside one row), distinct,
    slice. All run inside codegen on the executors — this is the JVM-side
    alternative to a Python token-statistics UDF, and the per-row cost is
    independent of cluster size (pure map)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.length(t) > 6)).cast("long").alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("head3"),
    )


@register(
    "regexp_suite",
    oracle="""
SELECT doc_id,
       regexp_extract(text, '[0-9]+', 0)                         AS first_num,
       regexp_extract(text, '([a-z]+)ing', 1)                    AS ing_stem,
       substr(regexp_replace(text, '[aeiou]', '', 'g'), 1, 40)   AS devoweled_40,
       CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
       CAST(CASE WHEN regexp_matches(text, '[0-9]') THEN 1 ELSE 0 END AS BIGINT) AS has_digit
FROM documents
""",
    tags=["functions", "regexp"],
)
def regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp toolkit: whole-match extract, capture-group extract, global
    replace, match counting, boolean match. Patterns restricted to the
    ASCII-class subset where Java regex (Spark) and RE2 (DuckDB) agree —
    same rule as the reference's Vietnamese rlike patterns (SURVEY P14):
    the pattern IS the business logic, keep it engine-portable."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract(t, "[0-9]+", 0).alias("first_num"),
        F.regexp_extract(t, "([a-z]+)ing", 1).alias("ing_stem"),
        F.substring(F.regexp_replace(t, "[aeiou]", ""), 1, 40).alias("devoweled_40"),
        F.regexp_count(t, F.lit("[aeiou]+")).cast("long").alias("n_vowel_runs"),
        F.when(t.rlike("[0-9]"), 1).otherwise(0).cast("long").alias("has_digit"),
    )


@register(
    "unpivot_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, val
FROM (
  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                  l_discount, l_tax
           FROM lineitem WHERE l_orderkey % 50 = 0)
  ON l_quantity, l_extendedprice, l_discount, l_tax
  INTO NAME measure VALUE val
)
""",
    tags=["functions", "unpivot"],
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long UNPIVOT (melt) of the four lineitem measures, keyed by
    (order, line). Pure row-local Expand — 4x the rows, zero shuffle; the
    inverse of pivot_event_types. Values pass through untouched (no
    arithmetic), so cross-engine parity is exact."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax",
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )


@register(
    "json_map_suite",
    oracle="""
SELECT e.event_id,
       u.k                                              AS k,
       CAST(json_extract(e.props, '$.' || u.k) AS BIGINT) AS v
FROM events e, unnest(json_keys(e.props)) AS u(k)
WHERE e.event_id % 20 = 0
""",
    tags=["functions", "json", "map"],
)
def json_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload -> MAP type -> exploded key/value rows: the generic
    form of schema-on-read for the reference's stringly-typed payloads
    (SURVEY P6) when the key set is open-ended — from_json to a map accepts
    ANY keys, where a struct schema would silently null unknown ones.
    Lateral explode is row-local (no shuffle)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 20 == 0)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return e.select("event_id", F.explode(m).alias("k", "v"))


@register(
    "window_dist_suite",
    oracle="""
SELECT o_orderkey,
       o_orderpriority,
       percent_rank() OVER w AS pr,
       cume_dist()    OVER w AS cd,
       nth_value(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS second_key
FROM orders
WHERE o_orderkey % 100 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
""",
    tags=["functions", "window"],
)
def window_dist_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank/cume_dist (integer
    ratios — engine-exact doubles) and nth_value over the full-partition
    frame. Ordering on the unique o_orderkey makes every value
    deterministic; one sort per partition key, shared by all three."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
    )


@register(
    "grouping_sets_explicit",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    tags=["functions", "grouping-sets"],
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form ROLLUP/CUBE are sugar for:
    per-flag totals, per-status totals, and the grand total, with no
    (flag, status) level. Expressed through spark.sql (the DataFrame API
    has rollup/cube but not arbitrary sets)."""
    from callio_etl_spark.tables import register_views

    register_views(spark, sf_dir, ["lineitem"])
    # Spark spells the bit-encoded grouping indicator GROUPING_ID(...);
    # DuckDB's multi-arg GROUPING(...) returns the same encoding.
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "null_semantics_suite",
    oracle="""
SELECT e.event_id,
       CAST(CASE WHEN e.value IS DISTINCT FROM o.o_totalprice
                 THEN 1 ELSE 0 END AS BIGINT)                  AS is_diff,
       CAST(CASE WHEN e.props IS NOT DISTINCT FROM NULL
                 THEN 1 ELSE 0 END AS BIGINT)                  AS props_null,
       COALESCE(NULLIF(e.event_type, 'view'), 'other')         AS type_or_other,
       CASE WHEN e.value IS NOT NULL THEN 'has' ELSE 'none' END AS nvl2_like
FROM events e
LEFT JOIN orders o ON e.event_id = o.o_orderkey
WHERE e.event_id % 25 = 0
""",
    tags=["functions", "null-semantics"],
)
def null_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe comparison semantics: IS [NOT] DISTINCT FROM (Spark's
    equal_null / <=>), NULLIF+COALESCE chains, NVL2-style presence
    branching — the three-valued-logic corners every engine must agree on,
    exercised across a LEFT join's generated NULLs."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 25 == 0)
    o = load_table(spark, sf_dir, "orders")
    j = e.join(o, e.event_id == o.o_orderkey, "left")
    return j.select(
        "event_id",
        (~F.col("value").eqNullSafe(F.col("o_totalprice")))
        .cast("long")
        .alias("is_diff"),
        F.col("props").eqNullSafe(F.lit(None)).cast("long").alias("props_null"),
        F.coalesce(F.nullif("event_type", F.lit("view")), F.lit("other")).alias(
            "type_or_other"
        ),
        F.when(F.col("value").isNotNull(), "has").otherwise("none").alias("nvl2_like"),
    )


@register(
    "date_spine_fill",
    oracle="""
WITH bounds AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
  FROM events WHERE user_id % 200 = 0 GROUP BY user_id
),
spine AS (
  -- scalar generate_series (list) + unnest: the table-function form can't
  -- take lateral column arguments in DuckDB
  SELECT b.user_id,
         CAST(unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds b
),
actual AS (
  SELECT user_id, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id % 200 = 0 GROUP BY user_id, CAST(ts AS DATE)
)
SELECT s.user_id, s.d, COALESCE(a.n, 0) AS n_events
FROM spine s LEFT JOIN actual a ON s.user_id = a.user_id AND s.d = a.d
""",
    tags=["functions", "date-spine"],
)
def date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill: a dense per-user daily series with explicit
    zero rows — the standard reporting fix for 'days with no events
    disappear from the fact table' (the reference's staff-daily fact has
    exactly this shape). sequence()+explode generates each user's spine
    from its own bounds (rows ∝ user-days, no cross join against a global
    calendar); the left join back is on the aggregate, which reuses the
    same (user, day) partitioning."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 200 == 0)
    ed = e.select("user_id", F.col("ts").cast("date").alias("d"))
    bounds = ed.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d"),
    )
    actual = ed.groupBy("user_id", "d").agg(F.count("*").alias("n"))
    return spine.join(actual, ["user_id", "d"], "left").select(
        "user_id", "d", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events")
    )


@register(
    "bitwise_agg_suite",
    oracle="""
SELECT l_returnflag,
       bit_and(l_partkey) AS all_bits,
       bit_or(l_partkey)  AS any_bits,
       bit_xor(l_partkey) AS parity_bits,
       CAST(bit_count(bit_or(l_partkey)) AS BIGINT) AS n_set_bits
FROM lineitem
WHERE l_orderkey % 40 = 0
GROUP BY l_returnflag
""",
    tags=["functions", "bitwise"],
)
def bitwise_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates + popcount — the primitives behind
    flag-mask rollups and bitmap-style membership summaries. Associative
    and commutative, so they partial-aggregate map-side like any sum;
    integer-exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 40 == 0)
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_partkey").alias("all_bits"),
        F.bit_or("l_partkey").alias("any_bits"),
        F.bit_xor("l_partkey").alias("parity_bits"),
        F.bit_count(F.bit_or("l_partkey")).cast("long").alias("n_set_bits"),
    )
