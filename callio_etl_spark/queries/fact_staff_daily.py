"""Flagship reporting query — the reference's fact_staff_daily_PK refresh
(/root/reference/callio_etl/runner.py:589-874) transplanted onto the driver's
synthetic star schema per FIXTURES.md.

Two queries:

- ``fact_staff_daily``   MERGE #A's SELECT body (runner.py:607-697):
  calls-per-staff-day aggregate (A1) FULL OUTER JOIN assigned-customers
  aggregate (A2+A3), with left joins to the group dim (J1/J2), COALESCE/IFNULL
  projection (P13) and the null-key guard (F4).
- ``fact_status_pivot``  MERGE #B's SELECT body (runner.py:733-848):
  staff-dim consolidation over UNION ALL (U1+A4+J3), the many-to-many phone
  join (J5), and the conditional regex pivot (A5) with the reference's
  Vietnamese patterns verbatim.

Column mapping (FIXTURES.md section A): events = call_log (ts = createTime,
user_id = fromUser__id), customer = staff dim source (c_name = fromUser__name),
nation = group (n_name = team name), orders = customer-assignment stream
(o_orderdate = assignedTime, o_custkey = user_id, o_orderkey = customer _id).

Determinism for the DuckDB oracle: ANY_VALUE -> MIN; double sums accumulate in
DECIMAL(18,6) then cast back to DOUBLE so both engines round identically
regardless of partition/accumulation order.

Scale notes (100 TB): the nation/group dim is broadcast (no shuffle); the two
grouped aggregates are partial (map-side combine) before the shuffle on
(Ngay, MaNV_id); the FULL OUTER join shuffles both sides on the same key the
aggregates just grouped by, so AQE reuses co-partitioning; the day-range
filter prunes partitions when the fact table is date-partitioned.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from callio_etl_spark.functions import ts_to_local_date
from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_tables

# The reference's A5 status buckets (runner.py:820-830), patterns verbatim.
ZALO_LIKE = "%zalo%"
CO_NHU_CAU_IN = ("có nhu cầu", "co nhu cau")
CO_NHU_CAU_RE = r"không đủ điều kiện|khong du dieu kien|suy nghĩ thêm|suy nghi them"
TU_CHOI_RE = (
    r"không nhu cầu|khong nhu cau|không có nhu cầu|khong co nhu cau"
    r"|khách chửi nhân viên|khach chui nhan vien|tắt máy ngang|tat may ngang"
    r"|khách không tương tác|khach khong tuong tac|đã có thẻ|da co the"
)
KHONG_NGHE_RE = (
    r"máy không nghe được|may khong nghe duoc|không nghe máy|khong nghe may"
    r"|thuê bao|thue bao"
)
BAN_IN = ("bận", "ban")

# Deterministic Vietnamese status derivation (the synthetic schema carries no
# status strings, so both engines derive one from the customer key: covers all
# four buckets, a non-matching value, and NULL).
STATUS_BY_MOD = [
    "Kết bạn Zalo rồi",  # bucket 1: LIKE %zalo%
    "có nhu cầu",  # bucket 2: IN list
    "không đủ điều kiện",  # bucket 2: regex
    "suy nghi them",  # bucket 2: regex (no diacritics arm)
    "không nhu cầu",  # bucket 3: regex
    "khach chui nhan vien",  # bucket 3: regex (no diacritics arm)
    "thuê bao",  # bucket 4: regex
    "bận",  # bucket 4: IN list
    "đang phân vân",  # matches nothing
]  # mod 10 == 9 -> NULL


def _decimal_sum(col, alias: str):
    return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)


@register(
    "fact_staff_daily",
    oracle="""
WITH calls AS (
  SELECT
    CAST(e.ts + INTERVAL 7 HOUR AS DATE) AS Ngay,
    CAST(e.user_id AS VARCHAR)           AS MaNV_id,
    MIN(c.c_name)                        AS MaNV,
    MIN(COALESCE(n.n_name, 'Unassigned')) AS Team,
    COUNT(*)                             AS TongCuoc,
    COUNT(DISTINCT e.event_type)         AS SoSDT_Unique,
    COUNT(*) FILTER (WHERE e.value > 100)  AS SoCuoc_NoiMay,
    COUNT(*) FILTER (WHERE e.value <= 100) AS SoCuoc_KhongNoiMay,
    CAST(SUM(CAST(CASE WHEN e.value > 100 THEN e.value ELSE 0 END
              AS DECIMAL(18,6))) AS DOUBLE) AS TongThoiluongGoi_Giay,
    CAST(SUM(CAST(CASE WHEN e.value <= 100
                       THEN GREATEST(e.value / 10.0 - 1.0, 0.0)
                       ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS TongRungChuong_Giay,
    MAX(epoch_ms(e.ts))                  AS max_create_ms
  FROM events e
  LEFT JOIN customer c ON e.user_id = c.c_custkey
  LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
  WHERE e.ts IS NOT NULL
  GROUP BY 1, 2
),
assigned AS (
  SELECT
    CAST(o.o_orderdate + INTERVAL 7 HOUR AS DATE) AS Ngay,
    CAST(o.o_custkey AS VARCHAR)                  AS MaNV_id,
    MIN(c.c_name)                                 AS MaNV,
    MIN(c.c_nationkey)                            AS group_id,
    COUNT(DISTINCT o.o_orderkey)                  AS SoDataNhan,
    MAX(epoch_ms(o.o_orderdate))                  AS max_assigned_ms
  FROM orders o
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderdate IS NOT NULL
  GROUP BY 1, 2
),
agg_assigned AS (
  SELECT
    a.Ngay, a.MaNV_id,
    MIN(a.MaNV)            AS MaNV,
    MIN(n.n_name)          AS Team,
    MAX(a.SoDataNhan)      AS SoDataNhan,
    MAX(a.max_assigned_ms) AS max_assigned_ms
  FROM assigned a
  LEFT JOIN nation n ON a.group_id = n.n_nationkey
  GROUP BY a.Ngay, a.MaNV_id
)
SELECT
  COALESCE(c.Ngay, s.Ngay)        AS Ngay,
  'PK'                            AS Tenant,
  COALESCE(c.Team, s.Team)        AS Team,
  COALESCE(c.MaNV_id, s.MaNV_id)  AS MaNV_id,
  COALESCE(c.MaNV, s.MaNV)        AS MaNV,
  COALESCE(c.TongCuoc, 0)               AS TongCuoc,
  COALESCE(c.SoSDT_Unique, 0)           AS SoSDT_Unique,
  COALESCE(c.SoCuoc_NoiMay, 0)          AS SoCuoc_NoiMay,
  COALESCE(c.SoCuoc_KhongNoiMay, 0)     AS SoCuoc_KhongNoiMay,
  COALESCE(c.TongThoiluongGoi_Giay, 0.0) AS TongThoiluongGoi_Giay,
  COALESCE(c.TongRungChuong_Giay, 0.0)   AS TongRungChuong_Giay,
  COALESCE(s.SoDataNhan, 0)             AS SoDataNhan,
  GREATEST(COALESCE(c.max_create_ms, 0), 0) AS max_create_ms,
  COALESCE(s.max_assigned_ms, 0)            AS max_assigned_ms
FROM calls c
FULL OUTER JOIN agg_assigned s
  ON c.Ngay = s.Ngay AND c.MaNV_id = s.MaNV_id
WHERE COALESCE(c.MaNV_id, s.MaNV_id) IS NOT NULL
""",
    tags=["flagship", "A1", "A2", "A3", "J1", "J2", "J4", "P9", "P13", "F4"],
)
def fact_staff_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-after-aggregation rewrite: the oracle (and the reference) joins
    the staff/group dims BEFORE aggregating and picks names with MIN; but
    every dim attribute is functionally dependent on the group key (one
    c_name / n_name per user_id), so the dim joins commute with the
    aggregate. Joining after shrinks the join input from |events| to
    |groups| AND keeps the aggregation buffer all-numeric, so Spark plans
    HashAggregate instead of Sort+SortAggregate (a string MIN in the buffer
    forces the sort-based fallback). Catalyst does not do this rewrite
    itself; values are identical by functional dependency."""
    t = load_tables(spark, sf_dir, ["events", "customer", "nation", "orders"])
    e, c, n, o = t["events"], t["customer"], t["nation"], t["orders"]
    cust_dim = c.select(
        F.col("c_custkey").cast("string").alias("ck"), "c_name", "c_nationkey"
    )
    ndim = F.broadcast(n.select("n_nationkey", "n_name"))

    calls_agg = (
        e.where(F.col("ts").isNotNull())
        .groupBy(
            ts_to_local_date(F.col("ts")).alias("Ngay"),
            F.col("user_id").cast("string").alias("MaNV_id"),
        )
        .agg(
            F.count("*").alias("TongCuoc"),
            F.countDistinct("event_type").alias("SoSDT_Unique"),
            F.count_if(F.col("value") > 100).alias("SoCuoc_NoiMay"),
            F.count_if(F.col("value") <= 100).alias("SoCuoc_KhongNoiMay"),
            _decimal_sum(
                F.when(F.col("value") > 100, F.col("value")).otherwise(F.lit(0.0)),
                "TongThoiluongGoi_Giay",
            ),
            _decimal_sum(
                F.when(
                    F.col("value") <= 100,
                    F.greatest(F.col("value") / 10.0 - 1.0, F.lit(0.0)),
                ).otherwise(F.lit(0.0)),
                "TongRungChuong_Giay",
            ),
            F.max(F.unix_millis(F.col("ts"))).alias("max_create_ms"),
        )
    )
    calls = (
        calls_agg.join(F.broadcast(cust_dim), calls_agg["MaNV_id"] == cust_dim["ck"], "left")
        .join(ndim, cust_dim["c_nationkey"] == ndim["n_nationkey"], "left")
        .select(
            calls_agg["*"],
            F.col("c_name").alias("MaNV"),
            F.coalesce(F.col("n_name"), F.lit("Unassigned")).alias("Team"),
        )
    )

    assigned_agg = (
        o.where(F.col("o_orderdate").isNotNull())
        .groupBy(
            ts_to_local_date(F.col("o_orderdate")).alias("Ngay"),
            F.col("o_custkey").cast("string").alias("MaNV_id"),
        )
        .agg(
            F.countDistinct("o_orderkey").alias("SoDataNhan"),
            F.max(F.unix_millis(F.col("o_orderdate"))).alias("max_assigned_ms"),
        )
    )
    # A3's re-aggregation after the group join collapses under the same
    # functional dependency: the keys are unchanged, so MAX(x) == x.
    agg_assigned = (
        assigned_agg.join(
            F.broadcast(cust_dim), assigned_agg["MaNV_id"] == cust_dim["ck"], "left"
        )
        .join(ndim, cust_dim["c_nationkey"] == ndim["n_nationkey"], "left")
        .select(
            assigned_agg["*"],
            F.col("c_name").alias("MaNV"),
            F.col("n_name").alias("Team"),
        )
    )

    cc, ss = calls.alias("c"), agg_assigned.alias("s")
    joined = cc.join(
        ss, (F.col("c.Ngay") == F.col("s.Ngay")) & (F.col("c.MaNV_id") == F.col("s.MaNV_id")), "full_outer"
    )
    return joined.where(
        F.coalesce(F.col("c.MaNV_id"), F.col("s.MaNV_id")).isNotNull()
    ).select(
        F.coalesce(F.col("c.Ngay"), F.col("s.Ngay")).alias("Ngay"),
        F.lit("PK").alias("Tenant"),
        F.coalesce(F.col("c.Team"), F.col("s.Team")).alias("Team"),
        F.coalesce(F.col("c.MaNV_id"), F.col("s.MaNV_id")).alias("MaNV_id"),
        F.coalesce(F.col("c.MaNV"), F.col("s.MaNV")).alias("MaNV"),
        F.coalesce(F.col("c.TongCuoc"), F.lit(0)).alias("TongCuoc"),
        F.coalesce(F.col("c.SoSDT_Unique"), F.lit(0)).alias("SoSDT_Unique"),
        F.coalesce(F.col("c.SoCuoc_NoiMay"), F.lit(0)).alias("SoCuoc_NoiMay"),
        F.coalesce(F.col("c.SoCuoc_KhongNoiMay"), F.lit(0)).alias("SoCuoc_KhongNoiMay"),
        F.coalesce(F.col("c.TongThoiluongGoi_Giay"), F.lit(0.0)).alias("TongThoiluongGoi_Giay"),
        F.coalesce(F.col("c.TongRungChuong_Giay"), F.lit(0.0)).alias("TongRungChuong_Giay"),
        F.coalesce(F.col("s.SoDataNhan"), F.lit(0)).alias("SoDataNhan"),
        F.greatest(F.coalesce(F.col("c.max_create_ms"), F.lit(0)), F.lit(0)).alias("max_create_ms"),
        F.coalesce(F.col("s.max_assigned_ms"), F.lit(0)).alias("max_assigned_ms"),
    )


def _status_case_sql(key: str) -> str:
    """CASE deriving a Vietnamese status string from an integer key (DuckDB)."""
    arms = "\n".join(
        f"      WHEN {i} THEN '{s}'" for i, s in enumerate(STATUS_BY_MOD)
    )
    return f"CASE ({key} % 10)\n{arms}\n      ELSE NULL END"


def _status_case_col(key) -> F.Column:
    """Same derivation, Spark side."""
    expr = F.when(key % 10 == 0, F.lit(STATUS_BY_MOD[0]))
    for i, s in enumerate(STATUS_BY_MOD[1:], start=1):
        expr = expr.when(key % 10 == i, F.lit(s))
    return expr.otherwise(F.lit(None).cast("string"))


@register(
    "fact_status_pivot",
    oracle=f"""
WITH staff_from_calls AS (
  SELECT
    CAST(e.ts + INTERVAL 7 HOUR AS DATE) AS Ngay,
    CAST(e.user_id AS VARCHAR)           AS MaNV_id,
    MIN(c.c_name)                        AS MaNV,
    MIN(c.c_nationkey)                   AS group_id
  FROM events e
  LEFT JOIN customer c ON e.user_id = c.c_custkey
  GROUP BY 1, 2
),
staff_from_cus AS (
  SELECT
    CAST(o.o_orderdate + INTERVAL 7 HOUR AS DATE) AS Ngay,
    CAST(o.o_custkey AS VARCHAR)                  AS MaNV_id,
    MIN(c.c_name)                                 AS MaNV,
    MIN(c.c_nationkey)                            AS group_id
  FROM orders o
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
staff_one AS (
  SELECT Ngay, MaNV_id, MIN(MaNV) AS MaNV, MIN(group_id) AS group_id
  FROM (SELECT * FROM staff_from_calls UNION ALL SELECT * FROM staff_from_cus)
  GROUP BY Ngay, MaNV_id
),
staff_enriched AS (
  SELECT s.Ngay, s.MaNV_id, s.MaNV, COALESCE(n.n_name, 'Unassigned') AS Team
  FROM staff_one s
  LEFT JOIN nation n ON s.group_id = n.n_nationkey
),
calls_all AS (
  SELECT
    CAST(e.ts + INTERVAL 7 HOUR AS DATE) AS Ngay,
    CAST(e.user_id AS VARCHAR)           AS MaNV_id,
    CAST(e.event_id % 100 AS VARCHAR)    AS SDTKhach
  FROM events e
),
customers_raw AS (
  SELECT
    CAST(c.c_custkey % 100 AS VARCHAR) AS phone,
    NULLIF(TRIM(CAST({_status_case_sql('c.c_custkey')} AS VARCHAR)), '') AS customField0_norm
  FROM customer c
),
with_status AS (
  SELECT c.Ngay, c.MaNV_id, cus.customField0_norm AS TrangThaiXuLi
  FROM calls_all c
  LEFT JOIN customers_raw cus ON c.SDTKhach = cus.phone
),
status_pivot AS (
  SELECT
    Ngay, MaNV_id,
    COUNT(*) FILTER (WHERE LOWER(TRIM(TrangThaiXuLi)) LIKE '{ZALO_LIKE}')
      AS SoSDT_KetBanZalo,
    COUNT(*) FILTER (WHERE LOWER(TRIM(TrangThaiXuLi)) IN ('{CO_NHU_CAU_IN[0]}', '{CO_NHU_CAU_IN[1]}')
      OR regexp_matches(LOWER(TRIM(TrangThaiXuLi)), '{CO_NHU_CAU_RE}'))
      AS SoSDT_CoNhuCau,
    COUNT(*) FILTER (WHERE regexp_matches(LOWER(TRIM(TrangThaiXuLi)), '{TU_CHOI_RE}'))
      AS SoSDT_TuChoi,
    COUNT(*) FILTER (WHERE regexp_matches(LOWER(TRIM(TrangThaiXuLi)), '{KHONG_NGHE_RE}')
      OR LOWER(TRIM(TrangThaiXuLi)) IN ('{BAN_IN[0]}', '{BAN_IN[1]}'))
      AS SoSDT_KhongNgheMay
  FROM with_status
  GROUP BY Ngay, MaNV_id
)
SELECT
  p.Ngay,
  'PK' AS Tenant,
  e.Team,
  p.MaNV_id,
  e.MaNV,
  p.SoSDT_KetBanZalo,
  p.SoSDT_CoNhuCau,
  p.SoSDT_TuChoi,
  p.SoSDT_KhongNgheMay
FROM status_pivot p
LEFT JOIN staff_enriched e ON p.Ngay = e.Ngay AND p.MaNV_id = e.MaNV_id
""",
    tags=["A4", "A5", "J3", "J5", "J6", "U1", "P12", "P14"],
)
def fact_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events", "customer", "nation", "orders"])
    e, c, n, o = t["events"], t["customer"], t["nation"], t["orders"]
    cust_dim = c.select("c_custkey", "c_name", "c_nationkey")
    ndim = F.broadcast(n.select("n_nationkey", "n_name"))

    # Join-after-aggregation (same functional-dependency argument as
    # fact_staff_daily): MaNV/group_id are determined by MaNV_id alone, so
    # the UNION ALL + MIN consolidation (A4) reduces to a DISTINCT over the
    # two key sets followed by one broadcast dim lookup — all-numeric
    # aggregation buffers (HashAggregate), dims joined against |staff-days|
    # rows instead of |events| + |orders|.
    cdim = F.broadcast(
        c.select(F.col("c_custkey").cast("string").alias("ck"), "c_name", "c_nationkey")
    )
    staff_keys = (
        e.select(
            ts_to_local_date(F.col("ts")).alias("Ngay"),
            F.col("user_id").cast("string").alias("MaNV_id"),
        )
        .unionByName(
            o.select(
                ts_to_local_date(F.col("o_orderdate")).alias("Ngay"),
                F.col("o_custkey").cast("string").alias("MaNV_id"),
            )
        )
        .distinct()
    )
    staff_enriched = (
        staff_keys.join(cdim, staff_keys["MaNV_id"] == cdim["ck"], "left")
        .join(ndim, cdim["c_nationkey"] == ndim["n_nationkey"], "left")
        .select(
            "Ngay",
            "MaNV_id",
            F.col("c_name").alias("MaNV"),
            F.coalesce(F.col("n_name"), F.lit("Unassigned")).alias("Team"),
        )
    )

    calls_all = e.select(
        ts_to_local_date(F.col("ts")).alias("Ngay"),
        F.col("user_id").cast("string").alias("MaNV_id"),
        (F.col("event_id") % 100).cast("string").alias("SDTKhach"),
    )
    # Plan note: the regex buckets are evaluated per CUSTOMER (small side,
    # once per row) BEFORE the fan-out join, so the joined rows carry four
    # booleans instead of re-running Java regexes per joined row — same
    # counts, ~|customers| regex evaluations instead of ~|joined rows|.
    status_norm = F.nullif(
        F.trim(_status_case_col(F.col("c_custkey")).cast("string")), F.lit("")
    )
    norm = F.lower(F.trim(status_norm))
    customers_raw = c.select(
        (F.col("c_custkey") % 100).cast("string").alias("phone"),
        norm.like(ZALO_LIKE).alias("f_zalo"),
        (norm.isin(*CO_NHU_CAU_IN) | norm.rlike(CO_NHU_CAU_RE)).alias("f_conhucau"),
        norm.rlike(TU_CHOI_RE).alias("f_tuchoi"),
        (norm.rlike(KHONG_NGHE_RE) | norm.isin(*BAN_IN)).alias("f_khongnghe"),
    )
    # J5: many-to-many phone join — the reference counts over the fanned-out
    # rows. The flags depend only on the join key, so COUNT_IF over the
    # fan-out factors into SUM(per-phone match counts): pre-aggregate the
    # build side to one row per phone, broadcast that, and sum. Identical
    # counts (left-miss rows contribute 0 via coalesce) without materializing
    # the |calls| x |customers-per-phone| intermediate — the rewrite that
    # keeps this join linear at 100 TB, and one Catalyst won't do for us.
    phone_stats = customers_raw.groupBy("phone").agg(
        F.count_if(F.col("f_zalo")).alias("n_zalo"),
        F.count_if(F.col("f_conhucau")).alias("n_conhucau"),
        F.count_if(F.col("f_tuchoi")).alias("n_tuchoi"),
        F.count_if(F.col("f_khongnghe")).alias("n_khongnghe"),
    )
    with_status = calls_all.join(
        F.broadcast(phone_stats), calls_all["SDTKhach"] == phone_stats["phone"], "left"
    )
    status_pivot = with_status.groupBy("Ngay", "MaNV_id").agg(
        F.sum(F.coalesce("n_zalo", F.lit(0))).alias("SoSDT_KetBanZalo"),
        F.sum(F.coalesce("n_conhucau", F.lit(0))).alias("SoSDT_CoNhuCau"),
        F.sum(F.coalesce("n_tuchoi", F.lit(0))).alias("SoSDT_TuChoi"),
        F.sum(F.coalesce("n_khongnghe", F.lit(0))).alias("SoSDT_KhongNgheMay"),
    )

    p, se = status_pivot.alias("p"), staff_enriched.alias("e")
    return p.join(
        se, (F.col("p.Ngay") == F.col("e.Ngay")) & (F.col("p.MaNV_id") == F.col("e.MaNV_id")), "left"
    ).select(
        F.col("p.Ngay").alias("Ngay"),
        F.lit("PK").alias("Tenant"),
        F.col("e.Team").alias("Team"),
        F.col("p.MaNV_id").alias("MaNV_id"),
        F.col("e.MaNV").alias("MaNV"),
        "SoSDT_KetBanZalo",
        "SoSDT_CoNhuCau",
        "SoSDT_TuChoi",
        "SoSDT_KhongNgheMay",
    )


def _flagship_spark_sql() -> str:
    """The flagship as Spark SQL text: byte-identical to the DuckDB oracle
    except two dialect spellings — epoch_ms() -> unix_millis() (same
    semantics) and bare VARCHAR -> STRING (Spark requires a length on
    VARCHAR). The reference ships this query AS SQL text (runner.py:589-874
    embeds it for BigQuery); accepting the same declarative shape through
    spark.sql — and getting a correct distributed plan from Catalyst with
    zero manual work — is the S10 'SQL execution channel' contract."""
    from callio_etl_spark.registry import REGISTRY

    return (
        REGISTRY["fact_staff_daily"]
        .oracle.replace("epoch_ms(", "unix_millis(")
        .replace("AS VARCHAR", "AS STRING")
    )


@register(
    "fact_staff_daily_sql",
    oracle=None,  # set below: identical to fact_staff_daily's oracle
    tags=["flagship", "S10", "sql-channel"],
)
def fact_staff_daily_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship executed from SQL TEXT over temp views — the untuned
    declarative form. Catalyst plans the dim joins before aggregation
    exactly as written (string MIN in the aggregation buffer -> sort-based
    aggregate), which is why the hand-rewritten DataFrame form in
    [fact_staff_daily] (join-after-aggregation by functional dependency)
    exists; both must return identical rows."""
    from callio_etl_spark.tables import register_views

    register_views(spark, sf_dir, ["events", "customer", "nation", "orders"])
    return spark.sql(_flagship_spark_sql())


def _copy_flagship_oracle() -> None:
    from callio_etl_spark.registry import REGISTRY

    REGISTRY["fact_staff_daily_sql"].oracle = REGISTRY["fact_staff_daily"].oracle


_copy_flagship_oracle()
