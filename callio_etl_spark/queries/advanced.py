"""Advanced relational operators beyond the reference's surface.

The reference (Khang-TB/Callio-ETL) has no as-of/range joins, no frame-spec
window functions, no grouping sets and no set ops beyond UNION ALL
(SURVEY.md sections 2.5/2.7 note their absence). A standalone analytics
engine needs them, so they're implemented here Spark-first, each with a
DuckDB oracle:

- ``asof_join_latest_order``  point-in-time (as-of) join. Spark lacks ASOF
  JOIN; a range self-join explodes, so it's computed as ONE union + ONE
  window pass: tag build/probe rows, sort within user by (ts, side), carry
  the last non-null build payload forward. One shuffle on the join key,
  linear in |events| + |orders| — the 100 TB-safe plan.
- ``sessionize``              gap-based sessionization (30-min inactivity):
  lag -> gap flag -> running sum = session number -> per-session rollup.
  Two window passes over the same (user, time) sort — Catalyst reuses the
  exchange, so it's one shuffle end-to-end.
- ``rollup_agg`` / ``cube_agg``  grouping-sets aggregates with GROUPING_ID.
- ``window_frames``           running total + 3-row moving average (ROWS
  BETWEEN frames); sums in DECIMAL so both engines agree bit-for-bit, the
  moving average as sum/count in double (identical operands both sides).
- ``percentile_summary``      exact interpolated percentiles. The quartile
  fractions are powers of two, so the interpolation x + d*(y-x) is exact in
  binary floating point and engine-independent.
- ``set_intersect_except``    INTERSECT / EXCEPT (distinct set semantics).

Determinism notes follow the registry rules: unique-key tiebreakers on every
ordering, DECIMAL accumulation for double sums, max_by on a unique key for
pick-one semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table

SESSION_GAP_MIN = 30


@register(
    "asof_join_latest_order",
    oracle="""
WITH ob AS (
  SELECT o_custkey, o_orderdate,
         max(o_orderkey)                    AS o_orderkey,
         max_by(o_totalprice, o_orderkey)   AS o_totalprice
  FROM orders
  GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts,
       ob.o_orderkey   AS last_orderkey,
       ob.o_totalprice AS last_totalprice
FROM events e
ASOF LEFT JOIN ob ON e.user_id = ob.o_custkey AND e.ts >= ob.o_orderdate
""",
    tags=["advanced", "asof-join"],
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the user's latest order at-or-before the
    event time. Build side is first reduced to one row per (user, ts) —
    max_by on the unique order key — so the as-of pick is deterministic.

    Plan: union build+probe rows, one window sorted by (ts, side) per user
    carrying the last non-null build payload forward (builds sort before
    probes at equal ts => inclusive <= semantics). No range join, no
    explosion: one shuffle on user_id, linear scan within partitions."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    ob = o.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )
    probe = e.select(
        F.col("user_id").alias("k"),
        F.col("ts"),
        F.lit(1).alias("side"),  # probes sort after builds at equal ts
        "event_id",
        F.lit(None).cast("struct<o_orderkey:bigint,o_totalprice:double>").alias("b"),
    )
    build = ob.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.struct("o_orderkey", "o_totalprice").alias("b"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = probe.unionByName(build).withColumn(
        "last_b", F.last("b", ignorenulls=True).over(w)
    )
    return carried.where(F.col("side") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        "ts",
        F.col("last_b.o_orderkey").alias("last_orderkey"),
        F.col("last_b.o_totalprice").alias("last_totalprice"),
    )


@register(
    "sessionize",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_no
""",
    tags=["advanced", "sessionize"],
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity threshold): the standard
    training-pipeline event op. Gap test runs on integer microseconds —
    exact in both engines. Both window passes share one (user_id) shuffle
    and one (ts, event_id) sort; the session rollup then shuffles the much
    smaller session keys."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev_ts) > gap_us),
        1,
    ).otherwise(0)
    numbered = e.withColumn("new_session", new_session).withColumn(
        "session_no",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


@register(
    "rollup_agg",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS sum_revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=["advanced", "grouping-sets"],
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets aggregate (TPC-H Q1 shape + subtotals + grand
    total), GROUPING_ID distinguishing subtotal rows from data NULLs.

    Computed as base-aggregate-then-rollup: COUNT/SUM are decomposable, so
    the fact table is first reduced to its finest grouping (a handful of
    rows), and ROLLUP's Expand runs over THAT. A naive rollup over the raw
    table Expands every input row once per grouping set (3x the scan rows
    through the aggregate at 100 TB); this form pays one ordinary hash
    aggregate plus an Expand over |groups| rows — the standard rewrite for
    additive grouping-set measures."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("pq"),
        F.sum(revenue).alias("pr"),
    )
    return base.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.sum("pn").cast("long").alias("n_rows"),
        F.sum("pq").cast("double").alias("sum_qty"),
        F.sum("pr").cast("double").alias("sum_revenue"),
    )


@register(
    "cube_agg",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=["advanced", "grouping-sets"],
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all four grouping sets in one pass.

    Same base-aggregate-then-expand rewrite as rollup_agg: COUNT/SUM are
    additive, so the fact table first reduces to its finest grouping and
    CUBE's 4-way Expand runs over those few rows instead of multiplying
    every scan row by the number of grouping sets."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("pp"),
    )
    return base.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.sum("pn").cast("long").alias("n_orders"),
        F.sum("pp").cast("double").alias("sum_price"),
    )


@register(
    "window_frames",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w3 AS DOUBLE)
         / CAST(COUNT(*) OVER w3 AS DOUBLE) AS moving_avg3
FROM orders
WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    tags=["advanced", "window-frames"],
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame window functions the reference never uses: per-customer
    running total and 3-row moving average. DECIMAL accumulation keeps the
    running sums engine-exact; the moving average divides two identical
    values in double. Both frames share one (custkey) shuffle + sort."""
    o = load_table(spark, sf_dir, "orders")
    ordering = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w3 = (
        Window.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(-2, Window.currentRow)
    )
    price_dec = F.col("o_totalprice").cast("decimal(18,6)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(price_dec).over(w_run).cast("double").alias("running_spend"),
        (
            F.sum(price_dec).over(w3).cast("double")
            / F.count("*").over(w3).cast("double")
        ).alias("moving_avg3"),
    )


@register(
    "percentile_summary",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5)  AS q50,
       quantile_cont(l_quantity, 0.75) AS q75,
       CAST(MAX(l_quantity) AS DOUBLE) AS q_max
FROM lineitem
GROUP BY l_returnflag
""",
    tags=["advanced", "percentiles"],
)
def percentile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. The fractions are powers of
    two so x + d*(y-x) is exact in binary FP — engine-independent without a
    DECIMAL detour (which percentile interpolation doesn't support anyway).
    Scale note: exact percentiles sort within groups; at 100 TB swap in
    approx_percentile (t-digest) behind the same signature when a bounded
    error is acceptable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.5).alias("q50"),
        F.percentile("l_quantity", 0.75).alias("q75"),
        F.max("l_quantity").cast("double").alias("q_max"),
    )


@register(
    "set_intersect_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderkey % 5 = 0
""",
    tags=["advanced", "set-ops"],
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT with distinct set semantics (the reference only
    ever UNION ALLs). Spark plans these as left-semi / left-anti hash joins
    over pre-aggregated inputs — no sort, partial distinct before the
    shuffle. Predicates on the unique order key keep the query
    deterministic and domain-independent."""
    o = load_table(spark, sf_dir, "orders")
    half = o.where(F.col("o_orderkey") % 2 == 0).select("o_custkey")
    third = o.where(F.col("o_orderkey") % 3 == 0).select("o_custkey")
    fifth = o.where(F.col("o_orderkey") % 5 == 0).select("o_custkey")
    return half.intersect(third).subtract(fifth)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_event_types",
    oracle="""
SELECT CAST(ts AS DATE) AS d,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view
FROM events
GROUP BY 1
""",
    tags=["advanced", "pivot"],
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic pivot via DataFrame.pivot with an explicit value list (the
    explicit list keeps the plan single-pass — omitting it costs an extra
    distinct-values job — and keeps the output schema static, which any
    downstream contract needs anyway). Missing combos surface as NULL from
    pivot; coalesced to 0 to match COUNT FILTER semantics."""
    e = load_table(spark, sf_dir, "events")
    p = (
        e.groupBy(F.col("ts").cast("date").alias("d"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "d", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in EVENT_TYPES]
    )


@register(
    "posexplode_tokens",
    oracle="""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS words
  FROM documents
  WHERE doc_id % 25 = 0
)
SELECT doc_id, CAST(e.idx - 1 AS INT) AS pos, e.tok AS token
FROM (
  SELECT doc_id,
         unnest(list_transform(words, (w, i) -> {'tok': w, 'idx': i})) AS e
  FROM t
)
""",
    tags=["advanced", "lateral"],
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral/table-generating surface: posexplode preserving element
    position (the reference has no TVFs at all, SURVEY section 2.8). Position
    order is the regex scan order — deterministic in both engines. (No
    dedup here: DuckDB's list_distinct does NOT preserve element order, so a
    distinct token list would make positions engine-dependent.)"""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    words = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
    return d.select("doc_id", F.posexplode(words).alias("pos", "token"))


RANGE_BIN_US = 15 * 60 * 1_000_000  # 15-minute buckets


@register(
    "range_join_bucketed",
    oracle="""
SELECT a.event_id,
       CAST(COUNT(*) FILTER (WHERE b.ts > a.ts
                               AND b.ts <= a.ts + INTERVAL 15 MINUTE)
            AS BIGINT) AS n_next15m
FROM events a
JOIN events b
  ON CAST(FLOOR(epoch_us(b.ts) / 900000000) AS BIGINT)
     BETWEEN CAST(FLOOR(epoch_us(a.ts) / 900000000) AS BIGINT)
         AND CAST(FLOOR(epoch_us(a.ts) / 900000000) AS BIGINT) + 1
GROUP BY a.event_id
""",
    tags=["advanced", "range-join"],
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join, bucketed: count events anywhere in the stream
    within 15 minutes after each event. A raw inequality join is a
    nested-loop O(n²); bucketing both sides into 15-min bins and equi-joining
    on {bin, bin+1} makes it a hash join whose candidate set is only the
    adjacent bins — the standard bin-bucketing rewrite for range joins at
    scale. A match's bin is always the probe's bin or the next one, so
    candidates are exact; every row matches its own bin (itself), so
    zero-match events survive without a left join. The oracle expresses the
    identical bucketed semantics relationally.

    The join runs at the TIME GRAIN, not the row grain (late-r6 collapse
    family): the count depends only on the timestamps, so events are
    pre-aggregated to (distinct microsecond, multiplicity) before the bin
    join — per-timestamp answers are Σ cnt over the window (the strict
    tb > ta bound excludes an event's own co-timestamped peers on both
    paths) — and an event_id-keyed fan-out join restores per-event rows.
    Dense streams (many events per instant — the common shape at
    second-grain sources) then pay |distinct ts|-bounded join work, the
    pre-aggregation every production interval join does."""
    e = load_table(spark, sf_dir, "events")
    ts_cnt = e.groupBy(F.unix_micros("ts").alias("t")).agg(
        F.count("*").alias("cnt")
    )
    a = ts_cnt.select(F.col("t").alias("ta")).withColumn(
        "bin",
        F.explode(
            F.array(
                F.floor(F.col("ta") / RANGE_BIN_US),
                F.floor(F.col("ta") / RANGE_BIN_US) + 1,
            )
        ),
    )
    b = ts_cnt.select(
        F.col("t").alias("tb"),
        "cnt",
        F.floor(F.col("t") / RANGE_BIN_US).alias("bin"),
    )
    per_ts = (
        a.join(b, "bin")
        .groupBy("ta")
        .agg(
            F.sum(
                F.when(
                    (F.col("tb") > F.col("ta"))
                    & (F.col("tb") <= F.col("ta") + RANGE_BIN_US),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("n_next15m")
        )
    )
    return e.select("event_id", F.unix_micros("ts").alias("ta")).join(
        per_ts, "ta"
    ).select("event_id", "n_next15m")


@register("approx_sketch_stats", oracle=None, tags=["advanced", "sketch"])
def approx_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based approximate aggregates — the 100 TB path where exact
    distinct counts / percentiles are too expensive: HyperLogLog++ distinct
    users and t-digest-style quantiles per event type, one pass, fixed-size
    mergeable state (partial-agg before the shuffle like any hash agg).

    No SQL oracle: DuckDB's approx algorithms differ (its HLL/quantile
    sketches produce different estimates), so the driver records rows-only;
    tests/test_llm_ops.py bounds the error against the exact answers
    (rsd=0.02 for HLL; quantile within the neighboring exact quantiles).

    Output is scalar-only (p50/p99 as separate DOUBLE columns, not one
    array): the driver's rows-only canonicalizer cannot sort array cells."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10_000)).alias("value_p50"),
        F.percentile_approx("value", F.lit(0.99), F.lit(10_000)).alias("value_p99"),
        F.count("*").alias("n_rows"),
    )


#: Sketch-audit tolerances. HLL: approx_count_distinct's rsd is the
#: STANDARD deviation of the estimator — 3x is the practical bound (a
#: >3-sigma miss means the sketch is broken, not unlucky). Quantiles:
#: percentile_approx(accuracy=10k) guarantees rank error <= N/10000;
#: 0.005 adds float-slop margin on the rank-fraction compare.
_HLL_RSD = 0.02
_Q_RANK_EPS = 0.005


@register(
    "sketch_error_bounds",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)                 AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT)  AS exact_users,
       CAST(1 AS BIGINT) AS hll_ok,
       CAST(1 AS BIGINT) AS p50_ok,
       CAST(1 AS BIGINT) AS p99_ok
FROM events
GROUP BY event_type
""",
    tags=["advanced", "sketch", "audit"],
)
def sketch_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-checked audit of the approximate sketches — the driver-
    checkable form of approx_sketch_stats (whose raw estimates can hold no
    cross-engine oracle because DuckDB's sketches differ): Spark computes
    BOTH the sketch and its own exact ground truth, emits pass/fail flags
    against the sketches' published error bounds, and the oracle asserts
    the flags are all 1 (plus the exact row/distinct counts, which ARE
    hash-comparable). A sketch drifting outside its bound breaks the hash
    — this is how a 100 TB deployment regression-tests its sketch
    configuration on an audit slice before trusting it corpus-wide.

    Bounds checked per event_type:
    - HLL++ distinct users within 3*rsd of exact (rsd={_HLL_RSD});
    - percentile_approx p50/p99 (accuracy 10k) returns an element whose
      RANK FRACTION brackets the target quantile within {_Q_RANK_EPS} —
      checked by joining the sketch value back and counting <=/<, NOT by
      computing an exact percentile (no single-task sort anywhere; the
      exact distinct is the only corpus-exact aggregate, and at full
      scale this audit runs on a sampled slice by design).

    Plan: one sketch aggregate -> |event_types| rows broadcast back ->
    one counting aggregate. Two passes over the scan, all map-combined."""
    e = load_table(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=_HLL_RSD).alias("hll_users"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10_000)).alias("p50_a"),
        F.percentile_approx("value", F.lit(0.99), F.lit(10_000)).alias("p99_a"),
    )
    audited = (
        e.join(F.broadcast(sk), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("user_id").cast("long").alias("exact_users"),
            F.max("hll_users").alias("hll_users"),  # constant per group
            F.sum((F.col("value") <= F.col("p50_a")).cast("long")).alias("le_p50"),
            F.sum((F.col("value") < F.col("p50_a")).cast("long")).alias("lt_p50"),
            F.sum((F.col("value") <= F.col("p99_a")).cast("long")).alias("le_p99"),
            F.sum((F.col("value") < F.col("p99_a")).cast("long")).alias("lt_p99"),
        )
    )
    n = F.col("n_rows").cast("double")

    def rank_ok(le, lt, q):
        return (
            (F.col(le).cast("double") / n >= q - _Q_RANK_EPS)
            & (F.col(lt).cast("double") / n <= q + _Q_RANK_EPS)
        ).cast("long")

    hll_ok = (
        F.abs(F.col("hll_users").cast("double") - F.col("exact_users"))
        <= 3 * _HLL_RSD * F.col("exact_users").cast("double")
    ).cast("long")
    return audited.select(
        "event_type",
        "n_rows",
        "exact_users",
        hll_ok.alias("hll_ok"),
        rank_ok("le_p50", "lt_p50", 0.5).alias("p50_ok"),
        rank_ok("le_p99", "lt_p99", 0.99).alias("p99_ok"),
    )


@register(
    "window_rank_suite",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(RANK() OVER w AS BIGINT)         AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT)   AS drnk,
       CAST(NTILE(4) OVER w AS BIGINT)       AS quartile,
       LAG(o_totalprice) OVER w              AS prev_price,
       LEAD(o_totalprice) OVER w             AS next_price,
       FIRST_VALUE(o_orderkey) OVER w        AS first_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
    tags=["advanced", "window-functions"],
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking/offset window surface beyond the reference's lone
    ROW_NUMBER (SURVEY section 2.7): rank, dense_rank, ntile, lag/lead,
    first_value, one shared (ASC, unique-tiebreak) ordering so every
    function is deterministic. All six share one shuffle + sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


@register(
    "date_fn_suite",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE)                              AS d,
       CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)   AS month_start,
       CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter_start,
       last_day(CAST(o_orderdate AS DATE))                    AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)     AS plus_2m,
       CAST(CAST(o_orderdate AS DATE) - 7 AS DATE)            AS minus_7d,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                                                              AS days_since_epoch_95,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)         AS y,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT)      AS q,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)        AS m,
       CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT)          AS dom
FROM orders
""",
    tags=["advanced", "date-functions"],
)
def date_fn_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function surface beyond the reference's epoch-ms day buckets
    (P8/P9/P17): truncation, month arithmetic (end-of-month clamping
    included), day offsets, date differences, and part extraction — the
    expressions every date-partitioned rollup at scale is built from.
    Engine-sensitive functions (week numbering, day-of-week origin) are
    deliberately excluded; those need an explicit convention (P17's
    iso_week_key / week_start_vn cover the reference's)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 2).alias("plus_2m"),
        F.date_sub(d, 7).alias("minus_7d"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_epoch_95"),
        F.year("o_orderdate").cast("long").alias("y"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
    )


@register(
    "string_fn_suite",
    oracle="""
SELECT p_partkey,
       split_part(p_name, ' ', 1)                          AS first_word,
       split_part(p_name, ' ', 2)                          AS second_word,
       levenshtein(p_name, p_brand)                        AS name_brand_dist,
       translate(p_name, 'aeiou', 'AEIOU')                 AS vowels_up,
       repeat(left(p_brand, 2), 2)                         AS brand_rep,
       reverse(p_type)                                     AS type_rev,
       lpad(CAST(p_size AS VARCHAR), 4, '0')               AS size_pad,
       CAST(strpos(p_name, ' ') AS BIGINT)                 AS space_pos,
       concat_ws('|', p_brand, p_type)                     AS brand_type
FROM part
""",
    tags=["advanced", "string-functions"],
)
def string_fn_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface beyond the reference's lower/trim/like/rlike
    (P11-P14): tokenized field access (split_part), edit distance
    (levenshtein — the cheap fuzzy-match primitive), character mapping,
    padding, position search, separator-joined concat. All chosen for
    identical cross-engine semantics on ASCII (unicode-sensitive functions
    like initcap differ per engine and are excluded)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.levenshtein("p_name", "p_brand").alias("name_brand_dist"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.repeat(F.substring("p_brand", 1, 2), 2).alias("brand_rep"),
        F.reverse("p_type").alias("type_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.instr("p_name", " ").cast("long").alias("space_pos"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "tumbling_window_agg",
    oracle="""
SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS w_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
WHERE user_id % 100 = 0
GROUP BY 1, 2
""",
    tags=["advanced", "time-window"],
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 15-minute tumbling windows in BATCH mode via F.window — the
    same expression Structured Streaming uses, so the batch backfill and
    the live stream share one definition (the lambda-architecture killer).
    window() is a row-local projection; the aggregate shuffles once on
    (window, type)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 100 == 0)
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
    )


@register(
    "hopping_window_agg",
    oracle="""
WITH x AS (
  SELECT ts, value,
         time_bucket(INTERVAL 15 MINUTE, ts) AS b,
         unnest([INTERVAL 0 MINUTE, INTERVAL 15 MINUTE]) AS back
  FROM events WHERE user_id % 100 = 0
)
SELECT b - back AS w_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM x
GROUP BY 1
""",
    tags=["advanced", "time-window"],
)
def hopping_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 30-minute windows every 15 minutes, so
    each event lands in exactly two windows. F.window with a slide emits
    one row per covering window BEFORE aggregation — the standard overlap
    expansion (2x here, window/slide in general); the oracle spells the
    same expansion as an unnest of the two candidate starts."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 100 == 0)
    return (
        e.groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n", "total_value")
    )


# ------------------------------------------------- incremental aggregation

AGG_SPLIT_DATE = "1997-01-01"  # orders before this date are the "base" run


@register(
    "incremental_agg_maintenance",
    oracle="""
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
       CAST(MIN(o_orderdate) AS DATE)   AS first_order,
       CAST(MAX(o_orderdate) AS DATE)   AS last_order
FROM orders
GROUP BY o_custkey
""",
    tags=["advanced", "incremental"],
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental VIEW MAINTENANCE for a per-key aggregate: the base run's
    aggregate STATE (count / decimal sum / min / max per customer) is kept
    as a table, and a delta batch updates it by aggregating ONLY the delta
    and combining states (sum-of-counts, sum-of-sums, min-of-mins,
    max-of-maxes) — the base FACTS are never rescanned. The oracle
    recomputes the aggregate from scratch over the full table: combining
    states must be indistinguishable from recomputation (count/sum/min/max
    are all commutative monoids; DECIMAL sums make the merge
    order-independent bit-exactly).

    Plan/scale: this is THE pattern for maintaining 100 TB rollups — cost
    per tick is O(delta) + O(|keys|) merge, not O(history). The combine is
    a groupBy over base-state ∪ delta-state, i.e. one shuffle of |keys| +
    |delta keys| rows; at cluster scale the state table is bucketed by key
    so even that shuffle disappears. AVG-class metrics derive from
    (sum, count) at read; only algebraic states are stored — the same
    decomposition Spark's own partial aggregation performs within a query,
    applied ACROSS runs. This is the APPEND-ONLY form (monoid merge; min/
    max cannot retract) — when the source also updates or deletes, use
    the CDC-consuming `ivm_refresh_agg` / `snapshots.snapshot_refresh_agg`,
    which subtracts pre-images."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    )
    split = F.lit(AGG_SPLIT_DATE).cast("date")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend_state"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )

    # Base state as a prior run would have persisted it; the delta tick
    # aggregates only its own rows, then merges states.
    base_state = state(o.where(F.col("o_orderdate") < split))
    delta_state = state(o.where(F.col("o_orderdate") >= split))
    return (
        base_state.unionByName(delta_state)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("spend_state").alias("spend_merged"),
            F.min("first_order").alias("first_order"),
            F.max("last_order").alias("last_order"),
        )
        .select(
            "o_custkey",
            "n_orders",
            F.col("spend_merged").cast("decimal(18,2)").cast("double").alias("total_spend"),
            "first_order",
            "last_order",
        )
    )


# ----------------------------------------------------------- z-order layout

ZORDER_BITS = 10  # bits per dimension -> 20-bit interleaved key


def zorder_key_col(x, y, bits: int = ZORDER_BITS):
    """Morton (z-order) key: interleave the low ``bits`` of two non-negative
    int columns — bit i of x lands at 2i, bit i of y at 2i+1. Pure integer
    arithmetic (division/mod by powers of two), so the same formula runs
    unchanged on any SQL engine. Sorting a table by this key clusters BOTH
    dimensions at once, giving parquet row-group min/max pruning on either
    column — the multi-column answer where sortWithinPartitions on one
    column only prunes that column."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        # bit TESTS, not division: integer/integer division semantics
        # differ across engines (float-divide + rounding cast vs
        # truncation) — x & (1 << i) is exact everywhere
        xbit = F.when(x.cast("long").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(0)
        ybit = F.when(y.cast("long").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(0)
        key = key + xbit * (1 << (2 * i)) + ybit * (1 << (2 * i + 1))
    return key


def _zorder_oracle() -> str:
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(
            f"(CASE WHEN (xk & {1 << i}) != 0 THEN 1 ELSE 0 END) * {1 << (2 * i)}"
        )
        terms.append(
            f"(CASE WHEN (yk & {1 << i}) != 0 THEN 1 ELSE 0 END) * {1 << (2 * i + 1)}"
        )
    zkey = " + ".join(terms)
    return f"""
WITH p AS (
  SELECT l_partkey % 1024 AS xk, l_suppkey % 1024 AS yk
  FROM lineitem
),
z AS (SELECT xk, yk, CAST({zkey} AS BIGINT) AS zkey FROM p)
SELECT CAST(FLOOR(zkey / 4096.0) AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT)           AS n,
       CAST(MIN(xk) AS BIGINT)            AS x_min,
       CAST(MAX(xk) AS BIGINT)            AS x_max,
       CAST(MIN(yk) AS BIGINT)            AS y_min,
       CAST(MAX(yk) AS BIGINT)            AS y_max
FROM z
GROUP BY 1
"""


@register(
    "zorder_layout",
    oracle=_zorder_oracle(),
    tags=["advanced", "layout"],
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering layout audit: compute the Morton key over the
    lineitem (partkey, suppkey) pair, group rows into zkey ranges ("row groups"),
    and report each group's min/max envelope on BOTH source dimensions.
    The envelopes are what parquet row-group statistics store — small
    per-group spans on both x AND y are exactly why a z-sorted table
    prunes selective filters on either column, which linear sort can only
    do for its leading column. (Write-side: pass the key to
    io.write_partitioned's cluster_cols / sortWithinPartitions — or use
    the snapshot store's `zorder_cols` + `file_stats`, where the same
    curve becomes a physical layout with manifest-recorded per-file
    ranges and actual file skipping: see `sink_zorder_skip`.)

    Plan/scale: the key is ~4*bits integer ops per row inside codegen
    (zero shuffle); the audit aggregate is one partial-then-final hash
    agg on the bucket. Z-ordering 100 TB is therefore a sort problem, not
    a compute problem — same cost class as any clustering rewrite."""
    ps = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 1024).alias("xk"),
        (F.col("l_suppkey") % 1024).alias("yk"),
    )
    z = ps.select("xk", "yk", zorder_key_col(F.col("xk"), F.col("yk")).alias("zkey"))
    return (
        z.groupBy(F.floor(F.col("zkey") / 4096).cast("long").alias("zbucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("xk").alias("x_min"),
            F.max("xk").alias("x_max"),
            F.min("yk").alias("y_min"),
            F.max("yk").alias("y_max"),
        )
    )
