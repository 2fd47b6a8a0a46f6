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
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE)       AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)               AS sy,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)  AS sxy
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
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q.cast(DEC)).cast("double").alias("sx"),
        F.sum((q * q).cast(DEC)).cast("double").alias("sxx"),
        F.sum(p.cast(DEC)).cast("double").alias("sy"),
        F.sum((p * p).cast(DEC)).cast("double").alias("syy"),
        F.sum((q * p).cast(DEC)).cast("double").alias("sxy"),
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
