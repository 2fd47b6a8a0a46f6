"""Scalar / projection operator queries (SURVEY.md section 2.2-2.3).

Each query isolates one operator family from the reference on the driver's
synthetic tables, with a DuckDB oracle. Reference citations in each docstring
point into /root/reference/callio_etl/.

All expressions are built-in Column functions — whole-stage codegen, no Python
UDFs — which is the Spark-first replacement for the reference's per-row pandas
`.apply` transforms.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from callio_etl_spark import functions as cf
from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table


@register(
    "scalar_suite",
    oracle="""
SELECT
  e.event_id,
  COALESCE(NULLIF(TRIM(e.event_type), ''), 'unknown')      AS etype_norm,
  GREATEST(e.value, 100.0)                                 AS val_floor,
  e.value / NULLIF(CAST(json_extract_string(e.props, '$.k') AS BIGINT), 0)
                                                           AS per_k,
  CASE WHEN e.value > 100 THEN 'high'
       WHEN e.value > 50  THEN 'mid'
       ELSE 'low' END                                      AS val_bucket,
  (LOWER(e.event_type) LIKE '%err%')                       AS is_err_like,
  (e.event_type IN ('signup', 'login'))                    AS is_auth,
  regexp_matches(LOWER(e.event_type), 'err|fail')          AS is_err_re,
  IFNULL(CAST(NULL AS DOUBLE), e.value)                    AS val_ifnull
FROM events e
""",
    tags=["P6", "P10", "P12", "P13", "P14"],
)
def scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10-P14 conditional/string scalar suite.

    Reference: COALESCE/IFNULL/GREATEST/SAFE_DIVIDE/CASE/NULLIF at
    runner.py:620-689, 802, 858-859; LIKE/IN/REGEXP_CONTAINS at
    runner.py:820-830; SAFE_CAST at runner.py:171, 454.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("long")
    return e.select(
        "event_id",
        F.coalesce(F.nullif(F.trim("event_type"), F.lit("")), F.lit("unknown")).alias(
            "etype_norm"
        ),
        F.greatest(F.col("value"), F.lit(100.0)).alias("val_floor"),
        F.try_divide(F.col("value"), F.nullif(k, F.lit(0))).alias("per_k"),
        F.when(F.col("value") > 100, "high")
        .when(F.col("value") > 50, "mid")
        .otherwise("low")
        .alias("val_bucket"),
        F.lower("event_type").like("%err%").alias("is_err_like"),
        F.col("event_type").isin("signup", "login").alias("is_auth"),
        F.lower("event_type").rlike("err|fail").alias("is_err_re"),
        F.ifnull(F.lit(None).cast("double"), F.col("value")).alias("val_ifnull"),
    )


@register(
    "json_extract",
    oracle="""
SELECT
  e.event_id,
  CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS k_num,
  json_extract_string(e.props, '$.k')                 AS k_str,
  json_extract_string(e.props, '$.missing')           AS k_missing
FROM events e
""",
    tags=["P6"],
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — permissive nested parse (safe_eval, utils.py:16-26): the JSON arm
    as get_json_object; missing paths yield NULL, matching the reference's
    dict.get fallbacks (utils.py:120-137)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k_num"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.missing").alias("k_missing"),
    )


@register(
    "time_buckets",
    oracle="""
SELECT
  e.event_id,
  CAST(e.ts AS DATE)                                   AS d_utc,
  CAST(e.ts + INTERVAL 7 HOUR AS DATE)                 AS d_hcm,
  strftime(e.ts, '%Y%m')                               AS yyyymm,
  CAST(date_part('isoyear', e.ts) AS VARCHAR) || '-' ||
    lpad(CAST(date_part('week', e.ts) AS VARCHAR), 2, '0') AS iso_week,
  CAST(date_trunc('week', e.ts + INTERVAL 7 HOUR) AS DATE) AS week_start_vn,
  epoch_ms(e.ts)                                       AS ts_ms
FROM events e
""",
    tags=["P8", "P9", "P17"],
)
def time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P9/P17 — epoch-ms day bucketing (runner.py:135-136, 300), local-TZ
    day bucketing (runner.py:610, 641, 654), and the date-key helpers
    (utils.py:69-101: yyyymm_from_ms, iso_week_key, week_start_vn)."""
    e = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    return e.select(
        "event_id",
        F.to_date(ts).alias("d_utc"),
        cf.ts_to_local_date(ts).alias("d_hcm"),
        cf.yyyymm_from_ts(ts).alias("yyyymm"),
        cf.iso_week_key(ts).alias("iso_week"),
        cf.week_start_vn(ts).alias("week_start_vn"),
        F.unix_millis(ts).alias("ts_ms"),
    )


@register(
    "row_hash",
    oracle="""
SELECT
  o.o_orderkey,
  md5(concat_ws(chr(31),
    COALESCE(CAST(o.o_custkey AS VARCHAR), chr(0)),
    COALESCE(CAST(o.o_orderkey AS VARCHAR), chr(0)),
    COALESCE(CAST(o.o_orderpriority AS VARCHAR), chr(0)),
    COALESCE(CAST(o.o_orderstatus AS VARCHAR), chr(0)))) AS row_hash
FROM orders o
""",
    tags=["P7"],
)
def row_hash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — deterministic change-detection row hash (utils.py:46-66; applied
    runner.py:137, 302). Canonical form: MD5 over unit-separator join of the
    stable columns sorted by name, NULLs as \\x00 (SURVEY section 7.5: defined
    canonically rather than byte-matching pandas' JSON dump)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    return o.select(
        "o_orderkey",
        cf.row_hash(o, exclude={"o_orderdate"}).alias("row_hash"),
    )


@register(
    "project_backfill",
    oracle="""
SELECT
  e.event_id,
  e.event_type,
  CAST(NULL AS VARCHAR) AS assigned_user,
  CAST(NULL AS VARCHAR) AS custom_field
FROM events e
""",
    tags=["P1", "P16"],
)
def project_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — fixed-column projection with NULL backfill for columns missing
    from the input (runner.py:114-133, 268-282): the declared schema wins,
    absent payload fields become typed NULLs."""
    e = load_table(spark, sf_dir, "events")
    return cf.project_with_null_backfill(
        e, ["event_id", "event_type", "assigned_user", "custom_field"]
    )


@register(
    "array_pick",
    oracle="""
SELECT
  d.doc_id,
  COALESCE(array_to_string(
    list_sort(list_distinct(
      list_transform(
        list_filter(string_split(d.text, ' '), w -> length(w) > 5),
        w -> upper(w)))),
    ' | '), '') AS long_words
FROM documents d
""",
    tags=["P5", "D4"],
)
def array_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/D4 — array lookup pipeline (utils.py:104-155): filter an array by
    predicate, transform, dedupe, ' | '-join. The reference walks
    customFields per row in Python; here it's higher-order functions over a
    split column (sorted instead of order-preserving so the oracle is
    order-insensitive; array_distinct preserves order in production use)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.filter(words, lambda w: F.length(w) > 5),
                        lambda w: F.upper(w),
                    )
                )
            ),
            " | ",
        ).alias("long_words"),
    )


@register(
    "string_norm",
    oracle="""
SELECT
  d.doc_id,
  NULLIF(TRIM(CAST(d.lang AS VARCHAR)), '') AS lang_norm,
  LOWER(TRIM(d.source))                     AS source_norm,
  CAST(d.n_chars AS VARCHAR)                AS n_chars_str
FROM documents d
""",
    tags=["P11", "P12"],
)
def string_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11/P12 — cast-to-string normalization (runner.py:112, 344, 611-613)
    and NULLIF(TRIM(SAFE_CAST(x AS STRING)), '') (runner.py:802)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        cf.norm_string(F.col("lang")).alias("lang_norm"),
        F.lower(F.trim("source")).alias("source_norm"),
        F.col("n_chars").cast("string").alias("n_chars_str"),
    )
