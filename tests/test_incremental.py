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


def test_flush_local_fastpath_byte_parity_with_spark_writer(spark, store):
    """r15 flush fast path: a LOCAL log path appends audit rows through a
    driver-side pyarrow write (the Spark job costs a fixed ~0.5-0.9 s per
    flushed tick; the bytes are the same). Parity is the contract: a log
    holding BOTH Spark-written and fastpath-written files must read back
    identically through warm()'s explicit-schema read and through a
    schema-inferring read, timestamps and NULLs intact."""
    import datetime as dt

    from callio_etl_spark.checkpoints import UPDATE_LOG_SCHEMA

    # one Spark-written file (the remote-warehouse arm, forced)
    spark.createDataFrame(
        [("t1", "PK", dt.datetime(2024, 1, 1, 12, 0, 0), 5, 1000, "MERGED")],
        UPDATE_LOG_SCHEMA,
    ).repartition(1).write.mode("append").parquet(store.log_path)
    # two fastpath-written rows, one with a NULL checkpoint
    store.log("t1", "PK", 7, None, "NOOP")
    store.log("t2", "VN", 0, 2000, "ERROR_LOGIN")
    store.flush()
    assert not store._buffer, "flush did not clear the buffer"

    got = {
        (r["table_name"], r["tenant"], r["updated_at"] is not None,
         r["rows_loaded"], r["max_update_ms"], r["mode"])
        for r in spark.read.schema(UPDATE_LOG_SCHEMA)
        .parquet(store.log_path).collect()
    }
    assert got == {
        ("t1", "PK", True, 5, 1000, "MERGED"),
        ("t1", "PK", True, 7, None, "NOOP"),
        ("t2", "VN", True, 0, 2000, "ERROR_LOGIN"),
    }
    # schema-inferring read over the mixed file set agrees with the
    # declared schema (no NTZ drift, no int32 narrowing)
    inferred = spark.read.parquet(store.log_path)
    assert inferred.schema == UPDATE_LOG_SCHEMA
    # warm() folds the fastpath rows back (the checkpoint row survives)
    fresh = CheckpointStore(spark, store.log_path)
    fresh.warm()
    assert fresh.get("t2", "VN") == 2000
    # a remote-scheme path refuses the fastpath (falls back to Spark)
    remote = CheckpointStore(spark, "s3a://bucket/update_log")
    remote.log("t", "PK", 1, 1, "MERGED")
    assert remote._flush_local_fastpath() is False


def test_checkpoint_table_name_normalization(spark, store):
    """Reference _normalize_table parity (checkpoints.py:83-85): strip,
    lowercase, '-'/' ' -> '_', applied on set/get/log/warm — 'Call-Log ' and
    'call_log' must hit the same checkpoint key."""
    store.set(" Call-Log ", "PK", 123)
    assert store.get("call_log", "PK") == 123
    assert store.get("CALL LOG", "PK") == 123
    store.log("Call-Log", "PK", 1, 456, "MERGED")
    store.flush()
    fresh = type(store)(spark=spark, log_path=store.log_path)
    fresh.warm()
    assert fresh.get("call_log", "PK") == 456


def test_checkpoint_warm_propagates_non_missing_errors(spark, tmp_path):
    """Only the missing-log cold start is swallowed; a corrupt log file must
    raise, not silently reset every checkpoint to the lookback window."""
    import pytest

    from callio_etl_spark.checkpoints import CheckpointStore

    missing = CheckpointStore(spark=spark, log_path=str(tmp_path / "nope"))
    missing.warm()  # cold start: no error, empty cache
    assert missing.get("t", "x") is None

    bad = tmp_path / "corrupt"
    bad.mkdir()
    (bad / "part-00000.parquet").write_text("this is not parquet")
    broken = CheckpointStore(spark=spark, log_path=str(bad))
    with pytest.raises(Exception):
        broken.warm()


def test_merge_write_rejects_out_of_window_source(spark, tmp_path):
    """ADVICE: a source row outside [part_min, part_max] would land in a
    partition excluded from the windowed target, and dynamic partition
    overwrite would then clobber that partition's pre-existing rows. The
    windowed merge_write must refuse; in-window sources must merge and leave
    sibling partitions untouched."""
    import pytest

    import pyspark.sql.functions as F
    from callio_etl_spark.merge import MergeSpec, merge_write

    path = str(tmp_path / "fact")
    target = spark.createDataFrame(
        [("2024-01-01", 1, "old"), ("2024-01-02", 2, "keep"), ("2024-01-03", 3, "other-part")],
        "d string, k long, v string",
    )
    target.write.partitionBy("d").parquet(path)

    spec = MergeSpec(keys=["k"])
    # out-of-window source row -> refuse before any write happens
    stray = spark.createDataFrame([("2024-01-03", 3, "clobber")], "d string, k long, v string")
    with pytest.raises(ValueError, match="outside the merge window"):
        merge_write(spark, path, stray, spec, partition_col="d",
                    part_min="2024-01-01", part_max="2024-01-02")
    after = {(str(r["d"]), r["k"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert after[("2024-01-03", 3)] == "other-part"  # untouched

    # in-window source: update k=1, insert k=9, keep k=2, never touch 01-03
    src = spark.createDataFrame(
        [("2024-01-01", 1, "new"), ("2024-01-02", 9, "ins")], "d string, k long, v string"
    )
    merge_write(spark, path, src, spec, partition_col="d",
                part_min="2024-01-01", part_max="2024-01-02")
    after = {(str(r["d"]), r["k"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert after == {
        ("2024-01-01", 1): "new",
        ("2024-01-02", 2): "keep",
        ("2024-01-02", 9): "ins",
        ("2024-01-03", 3): "other-part",
    }


def test_merge_write_full_rewrite_is_gated(spark, tmp_path):
    """VERDICT r3 item 8: without partition_col merge_write rewrites the
    whole target, so it must refuse unless allow_full_rewrite=True, and
    refuse regardless above FULL_REWRITE_MAX_ROWS — a forgotten
    partition_col must never silently full-rewrite a fact table."""
    import pytest

    from callio_etl_spark import merge as m

    path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).write.parquet(path)
    spec = m.MergeSpec(keys=["k"])
    src = spark.createDataFrame([(1, "A"), (3, "c")], "k long, v string")

    with pytest.raises(ValueError, match="allow_full_rewrite"):
        m.merge_write(spark, path, src, spec)
    assert {r["v"] for r in spark.read.parquet(path).collect()} == {"a", "b"}

    # explicit opt-in on a dim-sized table: merge applies
    m.merge_write(spark, path, src, spec, allow_full_rewrite=True)
    after = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert after == {1: "A", 2: "b", 3: "c"}

    # even with opt-in, a fact-sized target is refused (ceiling check)
    orig = m.FULL_REWRITE_MAX_ROWS
    m.FULL_REWRITE_MAX_ROWS = 2
    try:
        with pytest.raises(ValueError, match="full rewrite refused"):
            m.merge_write(spark, path, src, spec, allow_full_rewrite=True)
    finally:
        m.FULL_REWRITE_MAX_ROWS = orig


def test_merge_upsert_null_key_rows_survive(spark):
    """ADVICE: side presence is detected via marker columns, not key
    nullness — a target-only row whose merge key is NULL must keep its data,
    and a null-null matched pair must route through the matched arm."""
    from callio_etl_spark.merge import MergeSpec, merge_upsert

    target = spark.createDataFrame(
        [(None, "t-null", 1), (1, "t-one", 1)], "k long, v string, n long"
    )
    # no source row for NULL: target-only with NULL key
    source = spark.createDataFrame([(1, "s-one", 2)], "k long, v string, n long")
    out = {r["k"]: r for r in merge_upsert(target, source, MergeSpec(keys=["k"])).collect()}
    assert out[None]["v"] == "t-null" and out[None]["n"] == 1  # data NOT wiped
    assert out[1]["v"] == "s-one"

    # null-null matched pair: keep_existing must read the TARGET value
    target2 = spark.createDataFrame([(None, "t-val", 7)], "k long, v string, n long")
    source2 = spark.createDataFrame([(None, "s-val", 8)], "k long, v string, n long")
    spec2 = MergeSpec(keys=["k"], keep_existing=["v"])
    got = merge_upsert(target2, source2, spec2).collect()
    assert len(got) == 1
    assert got[0]["v"] == "t-val"  # IFNULL(T.v, S.v) keeps existing
    assert got[0]["n"] == 8  # non-keep column takes source


def test_update_log_compaction_bounds_files_and_keeps_checkpoints(
    spark, store, tmp_path
):
    """r12: the update_log appends one parquet file per flushed tick
    forever; compact() bounds it to newest-N audit rows per key PLUS
    each key's checkpoint row (max max_update_ms) — which must survive
    even when a long run of NOOP ticks pushes it past the audit window —
    and a fresh store's warm() sees identical checkpoints after."""
    import glob
    import os

    from callio_etl_spark.checkpoints import CheckpointStore

    # 8 flushed ticks for TableA: one MERGED advance to T0+5h, then 7
    # NOOP audit rows carrying a STALE watermark (T0+1h) — newer by
    # updated_at, lower by max_update_ms, so the true checkpoint row is
    # the OLDEST row and only the union branch can save it; TableB gets
    # one MERGED row per tick (advancing checkpoint)
    for i in range(8):
        if i == 0:
            store.log("TableA", "PK", 100, T0 + 5 * HOUR, "MERGED")
        else:
            store.log("TableA", "PK", 0, T0 + 1 * HOUR, "NOOP")
        store.log("Table-B", "PK", 10 + i, T0 + i * HOUR, "MERGED")
        store.flush()
    files_before = len(glob.glob(store.log_path + "/*.parquet"))
    assert files_before >= 8, "precondition: one file per flush"

    warm_before = CheckpointStore(spark, store.log_path)
    warm_before.warm()
    kept = store.compact(keep_rows_per_key=3)
    # per key: 3 audit rows; TableA's checkpoint row (the i==0 MERGED,
    # OLDER than the 3 newest NOOPs) must be the +1
    assert kept == 7, f"retained {kept}, want 3+1 (TableA) + 3 (Table-B)"
    files_after = len(glob.glob(store.log_path + "/*.parquet"))
    assert files_after < files_before

    warm_after = CheckpointStore(spark, store.log_path)
    warm_after.warm()
    for key in (("tablea", "PK"), ("table_b", "PK")):
        assert warm_after._cache[key] == warm_before._cache[key], key
    # the preserved TableA checkpoint row is the MERGED one
    rows = spark.read.parquet(store.log_path).where(
        "table_name = 'tablea' and mode = 'MERGED'"
    ).collect()
    assert len(rows) == 1 and rows[0]["max_update_ms"] == T0 + 5 * HOUR

    # compacting an absent log is a no-op, not a crash
    empty = CheckpointStore(spark, str(tmp_path / "nolog"))
    assert empty.compact() == 0


def test_update_log_opportunistic_compaction_threshold(spark, store):
    """r12: compact_if_needed is a per-tick cheap probe — below the file
    threshold it does nothing; above it, one compaction runs and the
    warmed checkpoints are unchanged."""
    from callio_etl_spark.checkpoints import CheckpointStore

    for i in range(5):
        store.log("TableA", "PK", 1, T0 + i * HOUR, "MERGED")
        store.flush()
    assert store.compact_if_needed(max_files=100) is None, (
        "compacted below the threshold"
    )
    kept = store.compact_if_needed(max_files=2, keep_rows_per_key=2)
    assert kept == 2  # newest 2; the max row IS the newest here
    after = CheckpointStore(spark, store.log_path)
    after.warm()
    assert after._cache[("tablea", "PK")] == T0 + 4 * HOUR
    # absent log: no-op
    assert (
        CheckpointStore(spark, store.log_path + "_none").compact_if_needed()
        is None
    )


def test_flush_vs_compact_never_loses_rows(spark, store):
    """r13: compact() is SELF-FENCING — the read-plan-swap and every
    flush() append serialize on the update_log's service lock, so a
    compaction racing a concurrent tick's audit append can never
    displace the appended rows (the r12 version only documented this
    hazard as caller discipline). With keep_rows_per_key far above the
    row count, NO row may ever be dropped — any loss here is the race."""
    import threading

    from callio_etl_spark.checkpoints import CheckpointStore

    n_ticks, errors, compactions = 8, [], []
    done = threading.Event()

    def flusher():
        try:
            for i in range(n_ticks):
                store.log("TableA", "PK", 1, T0 + i * HOUR, "MERGED")
                store.flush()
        except Exception as exc:  # surfaced below — threads swallow raises
            errors.append(exc)
        finally:
            done.set()

    def compactor():
        try:
            # bounded: each locked compact alternates with ~1 flush, so a
            # handful of rounds covers every interleaving class
            while not done.is_set() and len(compactions) < 4:
                compactions.append(store.compact(keep_rows_per_key=10_000))
        except Exception as exc:
            errors.append(exc)

    threads = [
        threading.Thread(target=flusher),
        threading.Thread(target=compactor),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert compactions, "compactor never got a turn"
    n = spark.read.parquet(store.log_path).count()
    assert n == n_ticks, f"lost {n_ticks - n} audit rows to the race"
    after = CheckpointStore(spark, store.log_path)
    after.warm()
    assert after._cache[("tablea", "PK")] == T0 + (n_ticks - 1) * HOUR


def test_audit_mode_vocabulary_emitted_from_triggers(spark, store, tmp_path):
    """r13: the reference's full C5 mode vocabulary lands from its real
    triggers (runner.py:90/144/312/412/536) — ERROR_LOGIN on a failed
    login (checkpoint HELD), STAGED on the staging landing (no
    checkpoint), APPEND on the call-log append (carrying the NEW
    checkpoint), TRUNCATE on the dim snapshot replace, NOOP on an empty
    staging batch."""
    from callio_etl_spark.pipeline import (
        append_tick,
        auth_guard,
        snapshot_truncate,
        stage_batch,
    )

    def bad_login():
        raise RuntimeError("401 bad credentials")

    assert auth_guard(store, "call-log", "T9", bad_login) is None
    assert store.get("call-log", "T9") is None, "failed login advanced ck"
    # falsy token (the reference's get_token returns None) also audits
    assert auth_guard(store, "call-log", "T8", lambda: None) is None
    # success path passes the token through, no audit row
    assert auth_guard(store, "call-log", "T7", lambda: "tok-1") == "tok-1"

    batch = spark.createDataFrame(
        [("a", T0 + HOUR, "T1"), ("b", T0 + 2 * HOUR, "T1")],
        "id string, ts_ms long, tenant string",
    )
    assert stage_batch(store, "customer", "T1", batch, str(tmp_path / "stg")) == 2
    assert store.get("customer", "T1") is None, "staging advanced ck"
    assert stage_batch(store, "customer", "T2", batch.limit(0), str(tmp_path / "stg")) == 0

    table = IncrementalTable(name="call-log", keys=["tenant", "id"], time_col_ms="ts_ms")
    new_ck = append_tick(spark, store, table, batch, str(tmp_path / "cl"), "T1")
    assert new_ck == T0 + 2 * HOUR
    assert store.get("call-log", "T1") == T0 + 2 * HOUR
    assert spark.read.parquet(str(tmp_path / "cl")).count() == 2
    # an older replay never rewinds the checkpoint (reference runner.py:310)
    old = spark.createDataFrame([("c", T0, "T1")], "id string, ts_ms long, tenant string")
    append_tick(spark, store, table, old, str(tmp_path / "cl"), "T1")
    assert store.get("call-log", "T1") == T0 + 2 * HOUR

    snapshot_truncate(spark, store, "group", batch, str(tmp_path / "grp"))
    store.flush()

    log = {
        (r["table_name"], r["tenant"], r["mode"]): r
        for r in spark.read.parquet(store.log_path).collect()
    }
    assert log[("call_log", "T9", "ERROR_LOGIN")]["rows_loaded"] == 0
    assert log[("call_log", "T9", "ERROR_LOGIN")]["max_update_ms"] is None
    assert ("call_log", "T7", "ERROR_LOGIN") not in log, "success audited"
    assert log[("customer", "T1", "STAGED")]["rows_loaded"] == 2
    assert log[("customer", "T1", "STAGED")]["max_update_ms"] is None
    assert log[("customer", "T2", "NOOP")]["rows_loaded"] == 0
    appends = [
        r for (t, ten, m), r in log.items()
        if m == "APPEND" and ten == "T1"
    ]
    assert {r["max_update_ms"] for r in appends} == {T0 + 2 * HOUR}, (
        "APPEND audit rows must carry the (never-rewinding) checkpoint"
    )
    assert log[("group", "ALL", "TRUNCATE")]["rows_loaded"] == 2
    assert log[("group", "ALL", "TRUNCATE")]["max_update_ms"] is None
    # a fresh warm() folds only the real watermarks back
    from callio_etl_spark.checkpoints import CheckpointStore

    after = CheckpointStore(spark, store.log_path)
    after.warm()
    assert after.get("call-log", "T1") == T0 + 2 * HOUR
    assert after.get("call-log", "T9") is None


def test_compact_retention_over_mixed_mode_history(spark, store):
    """r13: compaction over a history mixing ALL modes keeps the
    checkpoint row (the max-watermark MERGED/APPEND row) even when a
    long run of NOOP/ERROR_LOGIN rows ages it past the audit window."""
    from callio_etl_spark.checkpoints import CheckpointStore

    store.log("call-log", "T1", 50, T0 + 3 * HOUR, "APPEND")  # the checkpoint
    store.log("customer", "T1", 9, None, "STAGED")
    store.log("group", "ALL", 25, None, "TRUNCATE")
    store.flush()
    for i in range(6):  # age the APPEND row out of the audit window
        store.log("call-log", "T1", 0, None, "ERROR_LOGIN")
        store.log("call-log", "T1", 0, T0 + HOUR, "NOOP")
        store.flush()
    before = CheckpointStore(spark, store.log_path)
    before.warm()
    store.compact(keep_rows_per_key=2)
    after = CheckpointStore(spark, store.log_path)
    after.warm()
    assert after.get("call-log", "T1") == before.get("call-log", "T1") == T0 + 3 * HOUR
    kept = spark.read.parquet(store.log_path)
    assert kept.where("mode = 'APPEND'").count() == 1, "checkpoint row dropped"
    # the mode-free keys keep their newest audit rows too
    assert kept.where("table_name = 'group'").count() == 1


def test_warm_and_flush_heal_a_torn_compact_swap(spark, store):
    """r13: compact()'s whole-table swap can be killed between its two
    renames — the entire log then sits under the BACKUP name with the
    committed staging beside it. A daemon restarting in that window must
    NOT cold-start (warm() rolls the swap forward first), and a flush
    landing first must NOT recreate the path (recovery would then read
    'swap already finished' and dispose the backup — the entire
    pre-crash history)."""
    from callio_etl_spark.checkpoints import CheckpointStore
    from callio_etl_spark.io import (
        _TABLE_MARKER,
        BACKUP_SUFFIX,
        STAGING_SUFFIX,
        _hadoop,
        _rename,
        _touch,
    )

    store.log("TableA", "PK", 5, T0 + 3 * HOUR, "MERGED")
    store.flush()
    path = store.log_path
    jvm, fs, _ = _hadoop(spark, path)

    def tear():
        # the exact crash state: path -> backup done, staging (marked,
        # i.e. fully written) not yet renamed in
        spark.read.parquet(path).write.mode("overwrite").parquet(
            path + STAGING_SUFFIX
        )
        _touch(jvm, fs, f"{path}{STAGING_SUFFIX}/{_TABLE_MARKER}")
        _rename(jvm, fs, path, path + BACKUP_SUFFIX)

    tear()
    fresh = CheckpointStore(spark, path)
    fresh.warm()  # must heal, not cold-start
    assert fresh.get("TableA", "PK") == T0 + 3 * HOUR
    assert spark.read.parquet(path).count() == 1

    tear()
    # flush-first path: the append must heal BEFORE creating the table
    fresh2 = CheckpointStore(spark, path)
    fresh2.log("TableA", "PK", 1, T0 + 4 * HOUR, "MERGED")
    fresh2.flush()
    log = spark.read.parquet(path)
    assert log.count() == 2, "torn swap lost the pre-crash history"
    after = CheckpointStore(spark, path)
    after.warm()
    assert after.get("TableA", "PK") == T0 + 4 * HOUR


def test_update_log_lock_waits_tick_sized_not_commit_sized(
    spark, store, monkeypatch
):
    """ADVICE r13 (r14 fix): flush()/warm()/compact() wait on the
    update_log's SERVICE lock, whose holder may be a whole compact of a
    ~100k-file log — acquire_service_lock's contract says waiters need a
    tick-sized timeout (LOCK_STALE_S + LOCK_TIMEOUT_S, as
    single_writer_tick passes), not the 120 s commit default that would
    raise a spurious TimeoutError and fail the tick."""
    from callio_etl_spark import io as cio

    expected = cio.LOCK_STALE_S + cio.LOCK_TIMEOUT_S
    seen: list[tuple[str, float | None]] = []
    real = cio.acquire_table_lock

    def spy(spark_, path, *a, **kw):
        if cio.SERVICE_LOCK_INFIX in path:
            seen.append((path, kw.get("timeout_s")))
        return real(spark_, path, *a, **kw)

    monkeypatch.setattr(cio, "acquire_table_lock", spy)

    store.log("Customer", "PK", 1, T0, "MERGED")
    store.flush()           # append under the service lock
    store.compact(1)        # whole-table swap under the service lock
    # warm() takes the lock only on the missing-path recovery branch
    missing = CheckpointStore(spark, store.log_path + "_missing")
    missing.warm()
    assert len(seen) >= 3, f"service-lock acquires not seen: {seen}"
    bad = [(p, t) for p, t in seen if t != expected]
    assert not bad, (
        f"service-lock waits must pass timeout_s={expected}: {bad}"
    )
