"""Change-tracking operators: SCD Type 2 history build + snapshot diff.

The reference's MERGE family (runner.py:163-199) keeps only the LATEST
row per key. These add the two standard change-tracking shapes a
warehouse engine is asked for next:

- ``scd2_history``  collapse an event stream into slowly-changing-
  dimension Type 2 rows (valid_from / valid_to / is_current) — run
  detection via lag + running change-count, one shuffle on the entity
  key, both window passes AND the rollup reuse that partitioning.
- ``table_diff``    CDC between two table snapshots: FULL OUTER join on
  the key, presence markers classify insert/delete, value fingerprint
  comparison classifies update — the set-based diff that feeds a MERGE.

Scale: both shuffle once on the entity key. table_diff's fingerprint
compare (md5 over the value columns) keeps the wide-row comparison a
single string equality; with both snapshots bucketed by key the join is
zero-exchange (io.write_bucketed demonstrates the layout).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table


@register(
    "scd2_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
         event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, event_type, ts_ms, event_id,
         SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS UNBOUNDED PRECEDING) AS grp
  FROM ordered
),
versions AS (
  SELECT user_id, MIN(event_type) AS status,
         MIN(ts_ms) AS valid_from_ms,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         grp
  FROM runs GROUP BY user_id, grp
)
SELECT user_id, status, valid_from_ms,
       LEAD(valid_from_ms) OVER w2 AS valid_to_ms,
       LEAD(valid_from_ms) OVER w2 IS NULL AS is_current,
       n_events
FROM versions
WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from_ms)
""",
    tags=["cdc", "window"],
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 from an event stream: consecutive equal-status runs per
    user become versioned rows with [valid_from, valid_to) and an
    is_current flag. lag() marks status changes, a running sum numbers the
    runs, a grouped rollup collapses them, lead() closes each interval.

    One hash partitioning on user_id serves the change-detect window, the
    run rollup, AND the interval-closing window — three logical passes,
    one exchange. Ordering is total ((ts, event_id) unique), so run ids
    and intervals are engine-deterministic. Timestamps surface as epoch
    millis: the raw parquet is nanos, Spark's session reads micros —
    millis is the common exact grain."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("ts_ms"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    runs = e.select(
        "user_id",
        "event_type",
        "ts_ms",
        F.sum(
            F.when(
                F.lag("event_type").over(w).isNull()
                | (F.lag("event_type").over(w) != F.col("event_type")),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("grp"),
    )
    versions = runs.groupBy("user_id", "grp").agg(
        F.min("event_type").alias("status"),
        F.min("ts_ms").alias("valid_from_ms"),
        F.count("*").cast("long").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from_ms")
    return versions.select(
        "user_id",
        "status",
        "valid_from_ms",
        F.lead("valid_from_ms").over(w2).alias("valid_to_ms"),
        F.lead("valid_from_ms").over(w2).isNull().alias("is_current"),
        "n_events",
    )


DIFF_INS_MOD, DIFF_UPD_MOD, DIFF_DEL_MOD = 3, 7, 5  # o_orderkey % 10 roles


@register(
    "table_diff",
    oracle=f"""
WITH snap_old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey % 10 <> {DIFF_INS_MOD}
),
snap_new AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 10 = {DIFF_UPD_MOD}
              THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE o_orderkey % 10 <> {DIFF_DEL_MOD}
),
j AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         a.o_orderkey IS NOT NULL AS in_old,
         b.o_orderkey IS NOT NULL AS in_new,
         md5(CAST(a.o_orderstatus AS VARCHAR) || '|' || CAST(a.o_totalprice AS VARCHAR))
           AS fp_old,
         md5(CAST(b.o_orderstatus AS VARCHAR) || '|' || CAST(b.o_totalprice AS VARCHAR))
           AS fp_new,
         a.o_totalprice AS old_price, b.o_totalprice AS new_price
  FROM snap_old a FULL OUTER JOIN snap_new b ON a.o_orderkey = b.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN NOT in_old THEN 'insert'
            WHEN NOT in_new THEN 'delete'
            ELSE 'update' END AS change,
       old_price, new_price
FROM j
WHERE NOT in_old OR NOT in_new OR fp_old <> fp_new
""",
    tags=["cdc", "join"],
)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC): classify every key as insert / delete / update
    between two snapshots, dropping unchanged rows. The snapshots here are
    derived views of `orders` (keys % 10 == {DIFF_INS_MOD} absent from the
    old snapshot -> inserts; == {DIFF_DEL_MOD} absent from the new ->
    deletes; == {DIFF_UPD_MOD} repriced -> updates) so the operator is
    exercised on all three arms deterministically.

    Pattern: FULL OUTER join on the key; presence via key-nullness of each
    side (keys are non-null in both snapshots by construction); change
    detection via an md5 fingerprint of the compared columns — ONE string
    equality regardless of row width. One shuffle on the key; bucketed
    snapshots make it zero-exchange. Fingerprints never leave the join
    (projected away), so the output stays narrow."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snap_old = o.where(F.col("o_orderkey") % 10 != DIFF_INS_MOD)
    snap_new = o.where(F.col("o_orderkey") % 10 != DIFF_DEL_MOD).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 10 == DIFF_UPD_MOD,
            F.col("o_totalprice") * 1.1,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )

    def fp(side):
        return F.md5(
            F.concat_ws(
                "|",
                F.col(f"{side}.o_orderstatus").cast("string"),
                F.col(f"{side}.o_totalprice").cast("string"),
            )
        )

    a, b = snap_old.alias("a"), snap_new.alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    in_old = F.col("a.o_orderkey").isNotNull()
    in_new = F.col("b.o_orderkey").isNotNull()
    return j.select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
            "o_orderkey"
        ),
        F.when(~in_old, "insert")
        .when(~in_new, "delete")
        .otherwise("update")
        .alias("change"),
        F.col("a.o_totalprice").alias("old_price"),
        F.col("b.o_totalprice").alias("new_price"),
        in_old.alias("_in_old"),
        in_new.alias("_in_new"),
        fp("a").alias("_fp_old"),
        fp("b").alias("_fp_new"),
    ).where(
        ~F.col("_in_old") | ~F.col("_in_new") | (F.col("_fp_old") != F.col("_fp_new"))
    ).drop("_in_old", "_in_new", "_fp_old", "_fp_new")
