"""The paginated-API source driven END TO END over real HTTP.

SURVEY S1-S4 + S7 each have plan-level and unit coverage; this module
gives the whole source stack one oracle-checked driver row with the
REAL transport in the loop: an in-process HTTP server
(sources/local_api_server.py) serves the reference API's exact wire
surface (login POST -> token header, page/pageSize/sort/from/to
params, docs/totalDocs/hasNextPage payload, 401 expiry, the literal
"Result window is too large" 400) over a deterministic slice of the
events table, and Spark ingests through
``spark.read.format("callio_paged_api").option("base_url", ...)`` —
HTTP count probes feed the bisection planner, executor page walks run
the descending early-stop scan with mid-walk token refreshes, and the
result must hash-match DuckDB computing the same aggregate straight
from the parquet. Only the endpoint is local (this container has no
external network); the client, wire format, auth cycle, and failure
paths are the production ones.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table

#: Jan 15 2024 00:00 UTC — the checkpoint cutoff the source must stop at
#: (S2): rows at/under it exist on the server but may never be fetched
#: past their page.
_CUTOFF_MS = 1705276800000
#: Feb 1 2024 00:00 UTC — pinned scan upper bound (determinism; the
#: reference uses now()).
_WINDOW_END_MS = 1706745600000


@register(
    "api_http_ingest",
    oracle="""
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       MAX(epoch_ms(e.ts)) AS max_ts_ms,
       CAST(SUM(CAST(FLOOR(e.value * 1e6) AS BIGINT)) AS BIGINT)
         AS value_fold
FROM events e
WHERE e.event_id % 7 = 3 AND epoch_ms(e.ts) > 1705276800000
GROUP BY 1
""",
    tags=["S1", "S2", "S3", "S4", "S7", "source", "http"],
)
def api_http_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-S4/S7 over live HTTP (reference api.py:81-231 — the whole
    client): serve events rows where event_id % 7 == 3 (INCLUDING rows
    at/under the cutoff, which only the source's descending early stop
    may exclude), ingest via the registered DataSource pointed at the
    server's base_url with day slices + proactive bisection, and
    aggregate per event type. Tokens expire server-side every 40
    requests, so larger runs exercise the 401 -> re-login -> retry path
    mid-walk (explicitly pinned in tests/test_api_source.py), and every
    run exercises the multi-actor auth cycle (planner + each executor
    worker logs in on its own token cache — asserted in-query); the
    oracle recomputes from parquet, so a dropped page, a replayed page
    surviving first-wins keying, a cutoff leak, or a lost slice all
    break the hash.

    Scale shape: the server is the EXTERNAL system (its row list is the
    remote corpus, driver-hosted here only because the endpoint must
    live in-process); Spark-side work is the production plan — N
    bisected slices fetched in parallel, per-partition early stop,
    downstream agg fully distributed."""
    from callio_etl_spark.sources.local_api_server import (
        LocalCallioApiServer,
    )
    from callio_etl_spark.sources.paged_api import CallioPagedDataSource

    e = load_table(spark, sf_dir, "events")
    served = [
        {
            "_id": str(r["event_id"]),
            "ts_ms": r["ts_ms"],
            "user_id": r["user_id"],
            "event_type": r["event_type"],
            "value": r["value"],
        }
        for r in e.where(F.col("event_id") % 7 == 3)
        .select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            "event_type",
            "value",
        )
        .collect()
    ]
    srv = LocalCallioApiServer(
        served,
        accounts={"etl@example.com": "pw"},
        result_window=10_000,
        expire_token_after=40,
    )
    base = srv.start()
    try:
        spark.dataSource.register(CallioPagedDataSource)
        df = (
            spark.read.format("callio_paged_api")
            .option("base_url", base)
            .option("endpoint", "event")
            .option("email", "etl@example.com")
            .option("password", "pw")
            .option("window_end_ms", _WINDOW_END_MS)
            .option("cutoff_ms", _CUTOFF_MS)
            .option("page_size", 500)
            .option(
                "api_schema",
                "_id string, ts_ms long, user_id long, "
                "event_type string, value double",
            )
            .load()
        )
        result = (
            df.groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.count_distinct("user_id").cast("long").alias("n_users"),
                F.max("ts_ms").alias("max_ts_ms"),
                F.sum(F.floor(F.col("value") * 1e6).cast("long"))
                .cast("long")
                .alias("value_fold"),
            )
        )
        # the HTTP roundtrip ends when the driver materializes; collect
        # here (driver-sized: |event_type| groups) so the server can stop
        rows = result.collect()
        if srv.logins < 2:
            raise AssertionError(
                "auth cycle never ran beyond one login: executor workers "
                "should authenticate on their own token caches (and token "
                "expiry force re-logins on longer runs)"
            )
        return spark.createDataFrame(rows, result.schema)
    finally:
        srv.stop()
