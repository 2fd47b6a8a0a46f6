"""Two-tick incremental protocol tests (FIXTURES.md B4; SURVEY section 5.3):
idempotency via row_hash guard, checkpoint monotonicity, update/skip/insert
MERGE arms, audit-log modes."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from callio_etl_spark.checkpoints import CheckpointStore
from callio_etl_spark.flatten import flatten_customer
from callio_etl_spark.pipeline import IncrementalTable, commit, run_tick

SCHEMA = (
    "_id string, assignedTime long, createTime long, updateTime long,"
    " name string, phone string,"
    " user struct<_id:string, name:string, group:struct<_id:string>>,"
    " customFields array<struct<key:string, val:string>>"
)

T0 = 1704067200000  # 2024-01-01 UTC
HOUR = 3_600_000


def _raw(_id, update_ms, phone):
    return {
        "_id": _id,
        "assignedTime": T0,
        "createTime": T0,
        "updateTime": update_ms,
        "name": f"name-{_id}",
        "phone": phone,
        "user": {"_id": "u1", "name": "A", "group": {"_id": "g1"}},
        "customFields": [{"key": "tinh-trang-kh", "val": "bận"}],
    }


@pytest.fixture()
def store(spark, tmp_path):
    return CheckpointStore(spark, str(tmp_path / "update_log"), overlap_ms=HOUR)


TABLE = IncrementalTable(name="Customer", keys=["tenant", "_id"], time_col_ms="updateTime")


def test_two_tick_update_skip_insert(spark, store):
    now = T0 + 10 * HOUR
    # tick 1: three rows
    b1 = flatten_customer(
        spark.createDataFrame(
            [_raw("a", T0 + HOUR, "1"), _raw("b", T0 + HOUR, "2"), _raw("c", T0 + HOUR, "3")],
            SCHEMA,
        ),
        "PK",
    )
    merged1, ck1 = run_tick(spark, store, TABLE, b1, None, "PK", now_ms=now)
    merged1 = merged1.localCheckpoint()
    commit(store, TABLE, "PK", ck1)
    assert ck1 == T0 + HOUR
    assert merged1.count() == 3

    # tick 2 overlaps: row a changed (phone), row b touched-but-identical
    # content with newer ts, row d new; row c not re-sent.
    b2 = flatten_customer(
        spark.createDataFrame(
            [
                _raw("a", T0 + 2 * HOUR, "1-changed"),
                _raw("b", T0 + 2 * HOUR, "2"),
                _raw("d", T0 + 2 * HOUR, "4"),
            ],
            SCHEMA,
        ),
        "PK",
    )
    merged2, ck2 = run_tick(spark, store, TABLE, b2, merged1, "PK", now_ms=now)
    merged2 = merged2.localCheckpoint()
    commit(store, TABLE, "PK", ck2)

    rows = {r["_id"]: r for r in merged2.collect()}
    assert set(rows) == {"a", "b", "c", "d"}  # c kept, d inserted
    assert rows["a"]["phone"] == "1-changed"  # updated (hash differs)
    assert rows["b"]["updateTime"] == T0 + 2 * HOUR  # newer ts wins even if same content
    assert ck2 == T0 + 2 * HOUR  # checkpoint advanced monotonically
    assert store.get("customer", "PK") == ck2  # lowercased lookup works


def test_replay_is_idempotent(spark, store):
    now = T0 + 10 * HOUR
    batch = flatten_customer(
        spark.createDataFrame([_raw("a", T0 + HOUR, "1"), _raw("b", T0 + HOUR, "2")], SCHEMA),
        "PK",
    )
    m1, ck1 = run_tick(spark, store, TABLE, batch, None, "PK", now_ms=now)
    m1 = m1.localCheckpoint()
    commit(store, TABLE, "PK", ck1)
    # replay the SAME batch (overlap re-read): nothing may change
    m2, ck2 = run_tick(spark, store, TABLE, batch, m1, "PK", now_ms=now)
    got = sorted((r["_id"], r["phone"], r["row_hash"]) for r in m2.collect())
    want = sorted((r["_id"], r["phone"], r["row_hash"]) for r in m1.collect())
    assert got == want
    assert m2.count() == 2


def test_noop_and_log_modes(spark, store, tmp_path):
    now = T0 + 10 * HOUR
    batch = flatten_customer(
        spark.createDataFrame([_raw("a", T0 + HOUR, "1")], SCHEMA), "PK"
    )
    m1, ck1 = run_tick(spark, store, TABLE, batch, None, "PK", now_ms=now)
    m1 = m1.localCheckpoint()
    commit(store, TABLE, "PK", ck1)
    # everything older than checkpoint-overlap -> NOOP, checkpoint unchanged
    m2, ck2 = run_tick(spark, store, TABLE, batch.where("_id = 'zzz'"), m1, "PK", now_ms=now)
    commit(store, TABLE, "PK", ck2)
    assert ck2 is None
    assert store.get("customer", "PK") == ck1

    log = spark.read.parquet(store.log_path)
    modes = {r["mode"] for r in log.collect()}
    assert modes == {"MERGED", "NOOP"}

    # warm() from the log reproduces the cache (C1)
    fresh = CheckpointStore(spark, store.log_path)
    fresh.warm()
    assert fresh.get("customer", "PK") == ck1
