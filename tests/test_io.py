"""Sink / table-lifecycle operators (SURVEY section 2.1, S8-S13)."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from callio_etl_spark.io import (
    delete_rows_between,
    load_append,
    load_truncate,
    write_partitioned,
)


def test_append_with_schema_evolution(spark, tmp_path):
    p = str(tmp_path / "t")
    load_append(spark.createDataFrame([(1, "a")], "id long, x string"), p)
    # S8: later batch adds a column (ALLOW_FIELD_ADDITION)
    load_append(spark.createDataFrame([(2, "b", 9.5)], "id long, x string, y double"), p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r["id"]: r for r in df.collect()}
    assert set(df.columns) == {"id", "x", "y"}
    assert rows[1]["y"] is None and rows[2]["y"] == 9.5


def test_truncate_replaces(spark, tmp_path):
    p = str(tmp_path / "t")
    load_append(spark.createDataFrame([(1,)], "id long"), p)
    load_truncate(spark.createDataFrame([(2,), (3,)], "id long"), p)
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == [2, 3]


def test_partitioned_write_layout(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a", "2024-01-01", 1), ("b", "2024-01-02", 2)], "tenant string, d string, v long"
    ).withColumn("d", F.col("d").cast("date"))
    write_partitioned(df, p, "d", cluster_cols=["tenant"])
    # S12 / section 1.4: hive-style day partition directories exist
    assert os.path.isdir(f"{p}/d=2024-01-01") and os.path.isdir(f"{p}/d=2024-01-02")
    # partition pruning: reading one day touches one directory
    one = spark.read.parquet(p).where(F.col("d") == "2024-01-01")
    assert [r["tenant"] for r in one.collect()] == ["a"]
    files = [f for r in one.select(F.input_file_name()).distinct().collect() for f in r]
    assert all("d=2024-01-01" in f for f in files)


def test_delete_rows_between(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(10).withColumn("v", F.col("id") * 2).write.parquet(p)
    delete_rows_between(spark, p, "id", 3, 6)  # S11: staging-window cleanup
    left = sorted(r["id"] for r in spark.read.parquet(p).collect())
    assert left == [0, 1, 2, 7, 8, 9]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key join WITHOUT any shuffle: the
    write-time hash layout replaces the runtime Exchange on both sides."""
    from callio_etl_spark.io import write_bucketed

    a = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn("va", F.col("k") * 2)
    b = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn("vb", F.col("k") + 7)
    write_bucketed(a, "bkt_a", ["k"], 8)
    write_bucketed(b, "bkt_b", ["k"], 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the big-big (SortMergeJoin) path is planned —
        # that's the case bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_join_matches_plain_join(spark):
    """salted_join must be row-identical to the plain join, including a
    pathological 90%-one-key skew and duplicate right-side keys."""
    from callio_etl_spark.io import salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, 0) for k in range(2, 102)],
        "k long, v long",
    )
    right = spark.createDataFrame(
        [(1, "hot"), (1, "hot2"), (2, "cold"), (999, "miss")], "k long, name string"
    )
    got = sorted(salted_join(left, right, "k").collect())
    want = sorted(left.join(right, "k").collect())
    assert got == want


def test_json_ingest_to_flatten_chain(spark, tmp_path):
    """End-to-end ingestion in the reference's native shape: nested JSON docs
    (struct user, array-of-struct customFields) -> read_json_docs with an
    explicit schema -> flatten_customer produces the flattened columns."""
    import json

    from callio_etl_spark.flatten import flatten_customer
    from callio_etl_spark.io import read_json_docs

    docs = [
        {
            "_id": "c1",
            "user": {"_id": "u1", "name": "An", "group": {"_id": "g1"}},
            "customFields": [{"key": "tinh-trang-kh", "val": "có nhu cầu"}],
            "updateTime": 1700000000000,
            "createTime": 1690000000000,
        },
        {"_id": "c2", "user": None, "customFields": None,
         "updateTime": 1700000100000, "createTime": None},
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(d, ensure_ascii=False) for d in docs))
    schema = (
        "_id string, user struct<_id:string,name:string,group:struct<_id:string>>, "
        "customFields array<struct<key:string,val:string>>, "
        "updateTime long, createTime long"
    )
    raw = read_json_docs(spark, str(p), schema)
    out = {r["_id"]: r for r in flatten_customer(raw, "PK").collect()}
    assert out["c1"]["user_id"] == "u1"
    assert out["c1"]["user_group_id"] == "g1"
    assert out["c1"]["customField_0_val"] == "có nhu cầu"
    assert out["c2"]["user_id"] is None
    assert out["c1"]["tenant"] == "PK"


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    """A filter on the partition column must prune at planning time: the scan
    reports the predicate under PartitionFilters and reads only matching
    directories."""
    from callio_etl_spark.io import write_partitioned

    df = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 5:02d}") for i in range(100)], "v long, d string"
    )
    path = str(tmp_path / "part")
    write_partitioned(df, path, "d")
    back = spark.read.parquet(path).where(F.col("d") == "2024-01-03")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "2024-01-03" in pf[0], plan
    assert back.count() == 20


def test_csv_ingest_with_corrupt_quarantine(spark, tmp_path):
    """Malformed CSV lines land in _corrupt_record; good rows parse fully."""
    from callio_etl_spark.io import read_csv_table
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    p = tmp_path / "in.csv"
    p.write_text("id,name,n\n1,alpha,10\n2,beta,not_a_number\n3,gamma,30\n")
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("n", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = read_csv_table(spark, str(p), schema=schema).cache()
    good = df.where(df._corrupt_record.isNull())
    bad = df.where(df._corrupt_record.isNotNull())
    assert good.count() == 2
    assert [r.id for r in bad.collect()] == [2]


def test_compact_partition_rewrites_only_target(spark, tmp_path):
    """Compaction merges one partition's files and leaves siblings alone."""
    import glob

    from callio_etl_spark.io import compact_partition, write_partitioned

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(d, i, f"v{i}") for d in ("2024-01-01", "2024-01-02") for i in range(40)],
        "d string, k int, v string",
    )
    write_partitioned(df, path, "d")
    # fragment partition d=2024-01-01 into many small files
    frag = spark.createDataFrame(
        [("2024-01-01", 100 + i, "x") for i in range(8)], "d string, k int, v string"
    )
    frag.repartition(8).write.mode("append").partitionBy("d").parquet(path)

    files_before_sibling = set(glob.glob(f"{path}/d=2024-01-02/*.parquet"))
    rows = compact_partition(spark, path, "d", "2024-01-01", target_files=1,
                             cluster_cols=["k"])
    assert rows == 48
    assert len(glob.glob(f"{path}/d=2024-01-01/*.parquet")) == 1
    assert set(glob.glob(f"{path}/d=2024-01-02/*.parquet")) == files_before_sibling
    got = spark.read.parquet(path)
    assert got.count() == 88
    assert got.where(F.col("d") == "2024-01-01").count() == 48


def test_orc_roundtrip(spark, tmp_path):
    """ORC write/read roundtrip — the other splittable columnar format the
    engine supports out of the box (predicate pushdown + column pruning
    work the same as parquet through the DSv2 reader)."""
    p = str(tmp_path / "t.orc")
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "k long, s string, v double")
    df.write.mode("overwrite").orc(p)
    back = spark.read.orc(p).orderBy("k")
    assert [tuple(r) for r in back.collect()] == [(1, "a", 1.5), (2, "b", 2.5)]


def test_salted_join_rejects_right_preserving_types(spark):
    """right/full_outer would emit each unmatched right row n_salts times
    (the right side is exploded across all salts) — must raise."""
    import pytest

    from callio_etl_spark.io import salted_join

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(1, "x")], "k long, w string")
    for how in ("right", "full_outer", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(left, right, "k", n_salts=4, how=how)
    # left-preserving types still work
    assert salted_join(left, right, "k", n_salts=4, how="left").count() == 1


def test_delete_rows_between_partition_scoped(spark, tmp_path):
    """Partition-scoped S11: only partitions containing in-range rows are
    rewritten (sibling partition FILES are byte-identical afterwards), a
    fully-emptied partition's directory is removed, and the surviving rows
    are exactly the complement."""
    import glob
    import os

    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"d{i // 10}", i * 2) for i in range(40)], "id long, d string, v long"
    )
    df.repartition(1).write.partitionBy("d").parquet(p)

    def snapshot(part):
        return {
            f: (os.path.getmtime(f), os.path.getsize(f))
            for f in glob.glob(f"{p}/d={part}/*.parquet")
        }

    untouched_before = snapshot("d3")
    assert untouched_before
    # delete ids 10..24: empties d1 (10-19) entirely, trims d2 (20-24),
    # leaves d0 and d3 alone
    delete_rows_between(spark, p, "id", 10, 24, partition_col="d")
    left = sorted(r["id"] for r in spark.read.parquet(p).collect())
    assert left == list(range(10)) + list(range(25, 40))
    assert snapshot("d3") == untouched_before  # sibling files untouched
    assert not os.path.exists(f"{p}/d=d1")  # emptied partition dir removed
    assert os.path.exists(f"{p}/d=d2")  # trimmed partition still there
    # layout preserved: the read still prunes on d
    pruned = spark.read.parquet(p).where(F.col("d") == "d0")
    assert sorted(r["id"] for r in pruned.collect()) == list(range(10))


# ----------------------------------------------------- atomic commit protocol


def _write_staging(spark, src_rows, staging, marker, partition_col=None):
    """Simulate a COMPLETED staging write that crashed before any rename:
    the parquet job finished and the mode marker was touched."""
    df = spark.createDataFrame(src_rows, "id long, d string, v long")
    w = df.repartition(1).write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(staging)
    open(f"{staging}/{marker}", "w").close()


def test_atomic_overwrite_reads_own_target(spark, tmp_path):
    """The classic self-overwrite: df is derived FROM the table it
    replaces. No localCheckpoint needed — staging completes against the
    old files before the swap — and no protocol dirs survive a clean
    commit."""
    from callio_etl_spark.io import atomic_overwrite

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, "x", i) for i in range(20)], "id long, d string, v long"
    ).write.parquet(p)
    halved = spark.read.parquet(p).where(F.col("id") < 10)
    atomic_overwrite(spark, halved, p)
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == list(range(10))
    assert not os.path.exists(p + ".__staging__")
    assert not os.path.exists(p + ".__backup__")
    assert not os.path.exists(f"{p}/__COMMIT_TABLE__")


def test_atomic_overwrite_crash_injection_keeps_old_table(spark, tmp_path, monkeypatch):
    """Inject a failure into the FIRST rename of the commit (old -> backup):
    the crashed table must still read as the old content after
    recover_table."""
    import callio_etl_spark.io as io

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, "x", i) for i in range(10)], "id long, d string, v long"
    ).write.parquet(p)

    real_rename = io._rename

    def boom(jvm, fs, src, dst):
        if dst.endswith(".__backup__"):
            raise RuntimeError("injected crash mid-commit")
        return real_rename(jvm, fs, src, dst)

    monkeypatch.setattr(io, "_rename", boom)
    new = spark.createDataFrame([(99, "y", 0)], "id long, d string, v long")
    try:
        io.atomic_overwrite(spark, new, p)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    monkeypatch.setattr(io, "_rename", real_rename)
    # Staging is complete+marked but commit never started: recover rolls
    # BACK (the old table was never touched).
    io.recover_table(spark, p)
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == list(range(10))
    assert not os.path.exists(p + ".__staging__")


def test_recover_drops_incomplete_staging(spark, tmp_path):
    """Crash DURING the staging write (no mode marker): recovery must
    delete the torn staging and leave the table untouched."""
    from callio_etl_spark.io import recover_table

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 1)], "id long, d string, v long"
    ).write.parquet(p)
    staging = p + ".__staging__"
    os.makedirs(staging)
    open(f"{staging}/part-00000.parquet", "w").write("torn")
    assert "incomplete" in recover_table(spark, p)
    assert not os.path.exists(staging)
    assert spark.read.parquet(p).count() == 1


def test_recover_rolls_forward_after_backup_rename(spark, tmp_path):
    """Crash between `path -> backup` and `staging -> path`: the table dir
    is MISSING; recovery must finish the commit (new content visible,
    protocol dirs gone)."""
    from callio_etl_spark.io import recover_table

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 1)], "id long, d string, v long"
    ).write.parquet(p)
    _write_staging(spark, [(2, "b", 2)], p + ".__staging__", "__COMMIT_TABLE__")
    os.rename(p, p + ".__backup__")  # the crash point
    recover_table(spark, p)
    rows = spark.read.parquet(p).collect()
    assert [r["id"] for r in rows] == [2]
    assert not os.path.exists(p + ".__backup__")
    assert not os.path.exists(p + ".__staging__")


def test_recover_drops_committed_backup(spark, tmp_path):
    """Crash between `staging -> path` and backup deletion: new table is
    live; recovery just drops the backup."""
    from callio_etl_spark.io import recover_table

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(2, "b", 2)], "id long, d string, v long"
    ).write.parquet(p)
    spark.createDataFrame(
        [(1, "a", 1)], "id long, d string, v long"
    ).write.parquet(p + ".__backup__")
    recover_table(spark, p)
    assert [r["id"] for r in spark.read.parquet(p).collect()] == [2]
    assert not os.path.exists(p + ".__backup__")


def test_atomic_partition_overwrite_swaps_only_affected(spark, tmp_path):
    """Only partitions present in df are replaced; sibling partition files
    are byte-identical afterwards; protocol dirs are cleaned up."""
    import glob

    from callio_etl_spark.io import atomic_partition_overwrite

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"d{i % 3}", i) for i in range(30)], "id long, d string, v long"
    ).repartition(1).write.partitionBy("d").parquet(p)
    before = {
        f: os.path.getmtime(f) for f in glob.glob(f"{p}/d=d2/*.parquet")
    }
    assert before
    repl = spark.createDataFrame(
        [(100, "d0", 0), (101, "d1", 0)], "id long, d string, v long"
    )
    atomic_partition_overwrite(spark, repl, p, "d")
    got = sorted(r["id"] for r in spark.read.parquet(p).collect())
    d2_ids = sorted(i for i in range(30) if i % 3 == 2)
    assert got == sorted([100, 101] + d2_ids)
    after = {f: os.path.getmtime(f) for f in glob.glob(f"{p}/d=d2/*.parquet")}
    assert after == before
    assert not os.path.exists(p + ".__staging__")
    assert not os.path.exists(p + ".__pbak__")


def test_recover_partition_swap_mid_loop(spark, tmp_path):
    """Crash halfway through the per-partition swap loop: one partition
    already swapped (old dir in pbak), one not started. Recovery must roll
    BOTH forward and drop the protocol dirs."""
    from callio_etl_spark.io import recover_table

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2)], "id long, d string, v long"
    ).repartition(1).write.partitionBy("d").parquet(p)
    staging, pbak = p + ".__staging__", p + ".__pbak__"
    _write_staging(
        spark, [(10, "a", 0), (20, "b", 0)], staging, "__COMMIT_PARTS__",
        partition_col="d",
    )
    # simulate: d=a fully swapped, d=b untouched
    os.makedirs(pbak)
    os.rename(f"{p}/d=a", f"{pbak}/d=a")
    os.rename(f"{staging}/d=a", f"{p}/d=a")
    recover_table(spark, p)
    got = sorted(r["id"] for r in spark.read.parquet(p).collect())
    assert got == [10, 20]
    assert not os.path.exists(staging)
    assert not os.path.exists(pbak)


def test_delete_rows_between_null_partition(spark, tmp_path):
    """In-range rows whose partition value is NULL (the
    __HIVE_DEFAULT_PARTITION__ dir) must be deleted too — isin() alone
    never matches NULL — and an emptied default partition's dir removed."""
    p = str(tmp_path / "t")
    rows = [(i, None if i < 10 else "d1", i) for i in range(20)]
    spark.createDataFrame(
        rows, "id long, d string, v long"
    ).repartition(1).write.partitionBy("d").parquet(p)
    assert os.path.exists(f"{p}/d=__HIVE_DEFAULT_PARTITION__")
    delete_rows_between(spark, p, "id", 0, 9, partition_col="d")
    left = sorted(r["id"] for r in spark.read.parquet(p).collect())
    assert left == list(range(10, 20))
    assert not os.path.exists(f"{p}/d=__HIVE_DEFAULT_PARTITION__")


def test_delete_rows_between_escaped_partition_value(spark, tmp_path):
    """Partition values containing Hive-escaped characters (:, #, space)
    must still have their emptied dirs removed — path construction goes
    through the same escaping the writer used, so deleted rows cannot
    resurrect from a missed directory."""
    p = str(tmp_path / "t")
    rows = [(i, "a:b #1" if i < 10 else "plain", i) for i in range(20)]
    spark.createDataFrame(
        rows, "id long, d string, v long"
    ).repartition(1).write.partitionBy("d").parquet(p)
    delete_rows_between(spark, p, "id", 0, 9, partition_col="d")
    left = sorted(r["id"] for r in spark.read.parquet(p).collect())
    assert left == list(range(10, 20))
    # the escaped dir is gone: re-running the same delete is a no-op and
    # nothing resurrects
    delete_rows_between(spark, p, "id", 0, 9, partition_col="d")
    assert spark.read.parquet(p).count() == 10


def test_merge_write_crash_recovery_end_to_end(spark, tmp_path, monkeypatch):
    """merge_write's partition path through an injected mid-swap crash:
    after recover_table the merged state is exactly what an uncrashed
    merge produces."""
    import callio_etl_spark.io as io
    from callio_etl_spark.merge import MergeSpec, merge_write

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "2024-01-01", "old"), (2, "2024-01-02", "old")],
        "k long, d string, val string",
    ).repartition(1).write.partitionBy("d").parquet(p)
    src = spark.createDataFrame(
        [(2, "2024-01-02", "new"), (3, "2024-01-02", "ins")],
        "k long, d string, val string",
    )
    spec = MergeSpec(keys=["k"])

    real_rename = io._rename
    calls = {"n": 0}

    def boom(jvm, fs, srcp, dstp):
        # let the backup rename of the first partition through, then crash
        # before its staging dir lands in the table
        calls["n"] += 1
        # "__staging__/" (with slash): a partition LEAF leaving staging —
        # not the writer-unique -> fixed staging handoff rename
        if ".__pbak__" not in dstp and ".__staging__/" in srcp:
            raise RuntimeError("injected crash mid-partition-swap")
        return real_rename(jvm, fs, srcp, dstp)

    monkeypatch.setattr(io, "_rename", boom)
    try:
        merge_write(
            spark, p, src, spec,
            partition_col="d", part_min="2024-01-02", part_max="2024-01-02",
        )
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    monkeypatch.setattr(io, "_rename", real_rename)
    io.recover_table(spark, p)
    # partition discovery infers d as DATE — stringify for the compare
    got = sorted(
        (r["k"], str(r["d"]), r["val"]) for r in spark.read.parquet(p).collect()
    )
    assert got == [
        (1, "2024-01-01", "old"),
        (2, "2024-01-02", "new"),
        (3, "2024-01-02", "ins"),
    ]


def test_atomic_overwrite_crash_sweep_every_step(spark, tmp_path):
    """Exhaustive crash-point sweep: abort the whole-table commit at the
    Nth filesystem mutation (rename/delete/marker-touch) for every N, run
    recover_table, and require the table to read back as EITHER the
    complete old state or the complete new state — never torn, never
    missing. This is the protocol's actual guarantee, tested at every
    reachable crash point."""
    import itertools

    import callio_etl_spark.io as io

    old_rows = {(i, i * 2) for i in range(10)}
    new_rows = {(i, i * 3) for i in range(5)}

    real = {"rename": io._rename, "delete": io._delete, "touch": io._touch}

    for crash_at in itertools.count(1):
        p = str(tmp_path / f"t{crash_at}")
        spark.createDataFrame(
            sorted(old_rows), "id long, v long"
        ).write.parquet(p)
        new_df = spark.createDataFrame(sorted(new_rows), "id long, v long")

        calls = {"n": 0}

        def make_boom(fn):
            def wrapped(*args, **kw):
                calls["n"] += 1
                if calls["n"] == crash_at:
                    raise RuntimeError(f"crash at fs-op {crash_at}")
                return fn(*args, **kw)

            return wrapped

        for name, fn in real.items():
            setattr(io, f"_{name}", make_boom(fn))
        try:
            io.atomic_overwrite(spark, new_df, p)
            crashed = False
        except RuntimeError:
            crashed = True
        finally:
            for name, fn in real.items():
                setattr(io, f"_{name}", fn)

        io.recover_table(spark, p)
        got = {(r["id"], r["v"]) for r in spark.read.parquet(p).collect()}
        assert got in (old_rows, new_rows), (
            f"crash at op {crash_at}: torn table {got}"
        )
        assert not os.path.exists(p + ".__staging__")
        assert not os.path.exists(p + ".__backup__")
        if not crashed:
            assert got == new_rows
            break  # no injection fired: every crash point swept


def test_atomic_partition_overwrite_crash_sweep_every_step(spark, tmp_path):
    """Same exhaustive sweep for the per-partition swap: after recovery,
    every partition must be fully old or fully new — and once the staging
    marker exists, recovery rolls FORWARD, so swapped/unswapped mixes
    resolve to the new state per partition."""
    import itertools

    import callio_etl_spark.io as io

    def read_state(p):
        out = {}
        for r in spark.read.parquet(p).collect():
            out.setdefault(r["d"], set()).add((r["id"], r["v"]))
        return out

    old = {"a": {(1, 10), (2, 20)}, "b": {(3, 30)}, "c": {(9, 90)}}
    new = {"a": {(1, 11)}, "b": {(3, 33), (4, 44)}}  # c untouched

    real = {"rename": io._rename, "delete": io._delete, "touch": io._touch}

    for crash_at in itertools.count(1):
        p = str(tmp_path / f"pt{crash_at}")
        rows = [(i, d, v) for d, s in old.items() for i, v in s]
        spark.createDataFrame(
            rows, "id long, d string, v long"
        ).repartition(1).write.partitionBy("d").parquet(p)
        repl = spark.createDataFrame(
            [(i, d, v) for d, s in new.items() for i, v in s],
            "id long, d string, v long",
        )

        calls = {"n": 0}

        def make_boom(fn):
            def wrapped(*args, **kw):
                calls["n"] += 1
                if calls["n"] == crash_at:
                    raise RuntimeError(f"crash at fs-op {crash_at}")
                return fn(*args, **kw)

            return wrapped

        for name, fn in real.items():
            setattr(io, f"_{name}", make_boom(fn))
        try:
            io.atomic_partition_overwrite(spark, repl, p, "d")
            crashed = False
        except RuntimeError:
            crashed = True
        finally:
            for name, fn in real.items():
                setattr(io, f"_{name}", fn)

        io.recover_table(spark, p)
        got = read_state(p)
        for d in got:
            assert got[d] in (old.get(d), new.get(d)), (
                f"crash at op {crash_at}: partition {d} torn: {got[d]}"
            )
        assert got["c"] == old["c"]  # untouched sibling always intact
        assert not os.path.exists(p + ".__staging__")
        assert not os.path.exists(p + ".__pbak__")
        if not crashed:
            assert got == {**old, **new}
            break


def test_salted_join_balances_hot_key_across_tasks(spark):
    """The point of salting: with one key holding ~95% of the left side, a
    plain shuffle join lands every hot row in ONE join task (max-task rows
    ~= hot-key rows — the straggler that serializes the stage at 100 TB),
    while salted_join spreads them across n_salts tasks. Measured directly:
    spark_partition_id() evaluated in the join stage counts rows per join
    task, with AQE and broadcast disabled so nothing rewrites the shape."""
    import pyspark.sql.functions as F

    from callio_etl_spark.io import salted_join

    old = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        n, hot_frac, n_salts = 100_000, 0.95, 16
        hot_n = int(n * hot_frac)
        big = spark.range(n).select(
            F.when(F.col("id") < hot_n, F.lit(1)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        small = spark.range(2_000).select(F.col("id").alias("k"), F.col("id").alias("w"))

        def max_task_rows(joined):
            per = (
                joined.select(F.spark_partition_id().alias("p"))
                .groupBy("p")
                .count()
                .collect()
            )
            return max(r["count"] for r in per)

        plain_max = max_task_rows(big.join(small, "k"))
        salted_max = max_task_rows(salted_join(big, small, "k", n_salts=n_salts))

        # plain: the hot key's task processes every hot row
        assert plain_max >= hot_n
        # salted: the hot key is split into n_salts (k, salt) combos; with 32
        # shuffle partitions a task can draw 2-3 combos (birthday collisions),
        # so bound at 4x the ideal hot_n/n_salts share — still >= 4x better
        # than the unsalted straggler
        assert salted_max <= 4 * hot_n // n_salts, (plain_max, salted_max)
        assert salted_max * 4 <= plain_max
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_versioned_overwrite_time_travel_and_restore(spark, tmp_path):
    """Versioned commits archive each displaced table as a readable
    snapshot: after three generations, both priors time-travel back
    bit-identically, and restore_table_version rolls the live table back
    while archiving the pre-restore state (restore is undoable)."""
    import callio_etl_spark.io as io

    p = str(tmp_path / "vt")
    gen = lambda k: {(i, i * k) for i in range(5)}
    df = lambda k: spark.createDataFrame(sorted(gen(k)), "id long, v long")

    io.atomic_overwrite(spark, df(1), p, keep_versions=3)
    assert io.list_table_versions(spark, p) == []  # first write: no prior
    io.atomic_overwrite(spark, df(2), p, keep_versions=3)
    io.atomic_overwrite(spark, df(3), p, keep_versions=3)
    assert io.list_table_versions(spark, p) == [1, 2]

    read = lambda ver: {
        (r["id"], r["v"])
        for r in io.read_table_version(spark, p, ver).collect()
    }
    assert read(None) == gen(3)
    assert read(1) == gen(1)
    assert read(2) == gen(2)

    io.restore_table_version(spark, p, 1, keep_versions=3)
    assert read(None) == gen(1)
    # pre-restore live table (gen 3) was archived as version 3
    assert io.list_table_versions(spark, p) == [1, 2, 3]
    assert read(3) == gen(3)

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        io.read_table_version(spark, p, 99)


def test_versioned_overwrite_vacuum_prunes_oldest(spark, tmp_path):
    """keep_versions bounds the archive: the newest K snapshots survive as
    a contiguous suffix, older ones are vacuumed by the next commit."""
    import callio_etl_spark.io as io

    p = str(tmp_path / "vv")
    for k in range(1, 6):
        df = spark.createDataFrame([(i, i * k) for i in range(3)], "id long, v long")
        io.atomic_overwrite(spark, df, p, keep_versions=2)
    # 5 commits -> 4 displaced tables; only the newest 2 remain
    assert io.list_table_versions(spark, p) == [3, 4]
    removed = io.vacuum_table_versions(spark, p, keep=1)
    assert removed == [3]
    assert io.list_table_versions(spark, p) == [4]


def test_versioned_overwrite_crash_sweep_never_loses_snapshot(
    spark, tmp_path
):
    """Crash-point sweep for the VERSIONED commit: abort at the Nth fs
    mutation, recover, and require (a) the live table reads complete-old
    or complete-new, and (b) whenever the new table is live, the displaced
    old table is present in the version archive — a crash can never both
    commit the replacement and lose the snapshot it displaced."""
    import itertools

    import callio_etl_spark.io as io

    old_rows = {(i, i * 2) for i in range(8)}
    new_rows = {(i, i * 3) for i in range(4)}
    real = {"rename": io._rename, "delete": io._delete, "touch": io._touch}

    for crash_at in itertools.count(1):
        p = str(tmp_path / f"vc{crash_at}")
        spark.createDataFrame(sorted(old_rows), "id long, v long").write.parquet(p)
        new_df = spark.createDataFrame(sorted(new_rows), "id long, v long")

        calls = {"n": 0}

        def make_boom(fn):
            def wrapped(*args, **kw):
                calls["n"] += 1
                if calls["n"] == crash_at:
                    raise RuntimeError(f"crash at fs-op {crash_at}")
                return fn(*args, **kw)

            return wrapped

        for name, fn in real.items():
            setattr(io, f"_{name}", make_boom(fn))
        try:
            io.atomic_overwrite(spark, new_df, p, keep_versions=3)
            crashed = False
        except RuntimeError:
            crashed = True
        finally:
            for name, fn in real.items():
                setattr(io, f"_{name}", fn)

        io.recover_table(spark, p)
        got = {(r["id"], r["v"]) for r in spark.read.parquet(p).collect()}
        assert got in (old_rows, new_rows), (
            f"crash at op {crash_at}: torn table {got}"
        )
        if got == new_rows:
            vers = io.list_table_versions(spark, p)
            assert vers, f"crash at op {crash_at}: committed but snapshot lost"
            archived = {
                (r["id"], r["v"])
                for r in io.read_table_version(spark, p, vers[-1]).collect()
            }
            assert archived == old_rows
        assert not os.path.exists(p + ".__staging__")
        assert not os.path.exists(p + ".__backup__")
        if not crashed:
            assert got == new_rows
            break


def test_restore_with_minimal_retention(spark, tmp_path):
    """restore_table_version with keep_versions=1: the restore reads the
    snapshot from the archive BEFORE the commit prunes it, so rolling back
    works even when retention immediately evicts the source version."""
    import callio_etl_spark.io as io

    p = str(tmp_path / "vr")
    gen = lambda k: {(i, i * k) for i in range(4)}
    for k in (1, 2):
        io.atomic_overwrite(
            spark,
            spark.createDataFrame(sorted(gen(k)), "id long, v long"),
            p,
            keep_versions=1,
        )
    assert io.list_table_versions(spark, p) == [1]
    io.restore_table_version(spark, p, 1, keep_versions=1)
    got = {(r["id"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert got == gen(1)
    # retention kept only the newest snapshot (the displaced gen-2 table)
    vers = io.list_table_versions(spark, p)
    assert len(vers) == 1
    archived = {
        (r["id"], r["v"])
        for r in io.read_table_version(spark, p, vers[0]).collect()
    }
    assert archived == gen(2)


def test_versioning_model_based_random_sequences(spark, tmp_path):
    """Model-based check of the versioned table lifecycle: drive random
    sequences of commit / restore / vacuum against a pure-Python model of
    (live generation, archived generation list) and require the real
    table to agree after every step — the whole-subsystem invariant the
    single-scenario tests can't sweep."""
    import random

    import callio_etl_spark.io as io

    KEEP = 3

    def df_for(gen):
        return spark.createDataFrame(
            [(i, gen) for i in range(3)], "id long, gen long"
        )

    def live_gen(p):
        rows = spark.read.parquet(p).collect()
        gens = {r["gen"] for r in rows}
        assert len(gens) == 1, f"torn table: {gens}"
        return gens.pop()

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        p = str(tmp_path / f"model{seed}")
        # model state: live generation + dict version-number -> generation
        next_gen = 1
        io.atomic_overwrite(spark, df_for(next_gen), p, keep_versions=KEEP)
        live, archive, next_v = next_gen, {}, 1
        for _ in range(12):
            op = rng.choice(["commit", "commit", "restore", "vacuum"])
            if op == "commit":
                next_gen += 1
                io.atomic_overwrite(spark, df_for(next_gen), p, keep_versions=KEEP)
                archive[next_v] = live
                next_v += 1
                live = next_gen
                for v in sorted(archive)[:-KEEP]:
                    del archive[v]
            elif op == "restore" and archive:
                v = rng.choice(sorted(archive))
                io.restore_table_version(spark, p, v, keep_versions=KEEP)
                target = archive[v]
                archive[next_v] = live
                next_v += 1
                live = target
                for w in sorted(archive)[:-KEEP]:
                    del archive[w]
            elif op == "vacuum":
                k = rng.randint(1, KEEP)
                io.vacuum_table_versions(spark, p, keep=k)
                for w in sorted(archive)[:-k]:
                    del archive[w]
            # real state must equal the model after every operation
            assert live_gen(p) == live
            assert io.list_table_versions(spark, p) == sorted(archive)
            for v, gen in archive.items():
                got = {r["gen"] for r in io.read_table_version(spark, p, v).collect()}
                assert got == {gen}, (v, gen, got)


def test_concurrent_atomic_overwrites_no_torn_table(spark, tmp_path):
    """Two writers racing interleaved atomic_overwrites on one table: after
    every round the table must read as EXACTLY one writer's complete
    dataset (never a torn mix, never missing), no commit-protocol debris
    survives, and the lock is released. This is the last-writer-wins
    contract the commit lock adds over the single-writer protocol."""
    import threading

    from callio_etl_spark.io import LOCK_SUFFIX, recover_table

    p = str(tmp_path / "race_t")
    spark.createDataFrame(
        [(i, "seed") for i in range(5)], "id long, w string"
    ).write.parquet(p)

    def writer(tag: str, n: int, errors: list):
        try:
            import callio_etl_spark.io as io

            df = spark.createDataFrame(
                [(i, tag) for i in range(n)], "id long, w string"
            )
            for _ in range(4):
                io.atomic_overwrite(spark, df, p)
        except Exception as e:  # surfaced below — assert in main thread
            errors.append(e)

    errors: list = []
    ta = threading.Thread(target=writer, args=("aa", 50, errors))
    tb = threading.Thread(target=writer, args=("bb", 80, errors))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errors, errors

    rows = spark.read.parquet(p).collect()
    tags = {r["w"] for r in rows}
    assert len(tags) == 1, f"torn table: {tags}"
    tag = tags.pop()
    want = 50 if tag == "aa" else 80
    assert len(rows) == want and sorted(r["id"] for r in rows) == list(range(want))
    assert recover_table(spark, p) == "clean"
    assert not os.path.exists(p + LOCK_SUFFIX)
    leftovers = [
        n for n in os.listdir(tmp_path) if n.startswith("race_t.__staging__")
    ]
    assert not leftovers, leftovers


def test_stale_commit_lock_is_reclaimed(spark, tmp_path):
    """A lock file left by a crashed writer (mtime older than the stale
    window) must not block the next committer: it reclaims the lock,
    commits, and the table reflects the new write."""
    from callio_etl_spark.io import LOCK_SUFFIX, atomic_overwrite

    p = str(tmp_path / "stale_t")
    spark.createDataFrame([(1, "old")], "id long, w string").write.parquet(p)
    lock = p + LOCK_SUFFIX
    with open(lock, "w"):
        pass
    two_hours_ago = time.time() - 2 * 3600
    os.utime(lock, (two_hours_ago, two_hours_ago))

    new = spark.createDataFrame([(2, "new")], "id long, w string")
    atomic_overwrite(spark, new, p)  # must not TimeoutError
    assert [r["w"] for r in spark.read.parquet(p).collect()] == ["new"]
    assert not os.path.exists(lock)


def test_live_commit_lock_blocks_until_released(spark, tmp_path):
    """A FRESH lock (simulating a committer mid-swap) must make a second
    committer wait; once released, the blocked commit proceeds. Uses a
    short timeout to prove the waiter was genuinely blocked."""
    import threading

    from callio_etl_spark.io import LOCK_SUFFIX, atomic_overwrite

    p = str(tmp_path / "block_t")
    spark.createDataFrame([(1, "old")], "id long, w string").write.parquet(p)
    lock = p + LOCK_SUFFIX
    with open(lock, "w"):
        pass  # fresh lock: held

    released = threading.Event()

    def release_later():
        time.sleep(1.5)
        os.remove(lock)
        released.set()

    t = threading.Thread(target=release_later)
    t.start()
    new = spark.createDataFrame([(2, "new")], "id long, w string")
    atomic_overwrite(spark, new, p)
    t.join()
    assert released.is_set(), "commit finished while the lock was held"
    assert [r["w"] for r in spark.read.parquet(p).collect()] == ["new"]


def test_lock_heartbeat_prevents_live_reclaim(spark, tmp_path):
    """A LIVE holder is never mistaken for a crashed one: the heartbeat
    refreshes the lock's mtime every stale_s/4, so a waiter that arrives
    after stale_s must still TIME OUT rather than reclaim — the stale
    window reclaims crashed holders only. The SERVICE lock wraps whole
    rebuild sequences (O(corpus) at scale), so 'held longer than stale_s'
    is a legitimate state, not a crash signal."""
    import pytest as _pytest

    from callio_etl_spark.io import acquire_table_lock, release_table_lock

    p = str(tmp_path / "beat_t")
    lock = acquire_table_lock(spark, p, stale_s=1.0)
    try:
        time.sleep(1.6)  # > stale_s: only the heartbeat keeps it fresh
        with _pytest.raises(TimeoutError):
            acquire_table_lock(spark, p, timeout_s=0.8, stale_s=1.0)
        assert os.path.exists(lock)
    finally:
        release_table_lock(spark, p)
    assert not os.path.exists(lock), "release must delete the beaten lock"
    # and the table is immediately acquirable again
    acquire_table_lock(spark, p)
    release_table_lock(spark, p)
    assert not os.path.exists(lock)


def test_lock_release_respects_a_reclaimed_lock(spark, tmp_path):
    """If a reclaim somehow races the heartbeat (holder paused past the
    stale window), the original holder must NOT delete the new holder's
    lock on release: ownership is token-checked once a beat has fired,
    so split-brain never cascades into a second mutual-exclusion loss."""
    from callio_etl_spark import io as cio
    from callio_etl_spark.io import acquire_table_lock, release_table_lock

    p = str(tmp_path / "reclaim_t")
    lock = acquire_table_lock(spark, p, stale_s=0.8)
    rec = cio._LOCK_BEATS[lock]
    fired, mutex = rec["fired"], rec["mutex"]
    assert fired.wait(15), "heartbeat never fired"
    jvm, fs, _ = cio._hadoop(spark, p)
    with mutex:  # serialize with the beat: no in-flight write can revert us
        # a waiter's reclaim + re-acquire, through the FS API like a real
        # reclaimer (a Python open() write poisons the LocalFileSystem's
        # .crc sidecar and turns the token read into a checksum error)
        cio._delete(jvm, fs, lock)
        assert cio._try_create_exclusive(jvm, fs, lock, content="someone-else")
    time.sleep(0.45)  # next beat observes the foreign token and stops
    release_table_lock(spark, p)
    assert os.path.exists(lock), "release deleted a lock it no longer owned"
    with open(lock) as fh:
        assert fh.read() == "someone-else"
    os.remove(lock)


def test_lock_heartbeat_survives_transient_claim_window(spark, tmp_path):
    """r11 ADVICE fix (io.py beat error path): during a waiter's
    rename-claim window the lock file is momentarily ABSENT even though
    the holder is live. A heartbeat that fires inside that window must
    treat 'missing' as transient (the restore lands in milliseconds) and
    KEEP BEATING once the file is back — exiting would leave a restored
    lock with no heartbeat, falsely reclaimable after stale_s."""
    import threading

    from callio_etl_spark import io as cio
    from callio_etl_spark.io import acquire_table_lock, release_table_lock

    p = str(tmp_path / "claimwin_t")
    lock = acquire_table_lock(spark, p, stale_s=0.8)  # beat every 0.2 s
    rec = cio._LOCK_BEATS[lock]
    fired, mutex = rec["fired"], rec["mutex"]
    assert fired.wait(15), "heartbeat never fired"

    claim = lock + ".reclaim.testwin"
    mutex.acquire()
    try:
        os.rename(lock, claim)  # a waiter's claim: lock momentarily gone
        time.sleep(0.3)  # > beat interval: a beat is now queued on mutex
        restorer = threading.Thread(
            target=lambda: (time.sleep(0.03), os.rename(claim, lock))
        )
        restorer.start()
    finally:
        mutex.release()  # queued beat runs NOW, with the file absent
    restorer.join()

    # the beat observed the missing file mid-window and must still be
    # alive: age the lock artificially and watch the next beat refresh it
    time.sleep(0.3)
    old = time.time() - 7200
    os.utime(lock, (old, old))
    deadline = time.time() + 2.0  # up to ~10 beat intervals of slack
    while time.time() < deadline:
        if time.time() - os.path.getmtime(lock) < 60:
            break
        time.sleep(0.05)
    assert time.time() - os.path.getmtime(lock) < 60, (
        "heartbeat died after a transient missing-lock window: the lock "
        "would be falsely reclaimable after stale_s"
    )
    release_table_lock(spark, p)
    assert not os.path.exists(lock)


def test_lock_reclaim_restore_retries_on_transient_error(
    spark, tmp_path, monkeypatch
):
    """r11 ADVICE fix (io.py restore branch): when the staleness re-check
    finds the claimed lock FRESH (a live beat raced the claim), a
    transient error in the restore probe must RETRY the rename — the old
    code's except path deleted the just-verified-fresh claim, silently
    un-locking a live holder (the next acquirer then wins create-if-absent
    and two writers commit concurrently)."""
    import glob as _glob

    import pytest as _pytest

    from callio_etl_spark import io as cio
    from callio_etl_spark.io import LOCK_SUFFIX, acquire_table_lock

    p = str(tmp_path / "restore_t")
    lock = p + LOCK_SUFFIX
    with open(lock, "w") as fh:
        fh.write("live-holder-token")  # a live holder's lock, no local beat

    calls = {"mtime": 0, "exists": 0}
    real_exists = cio._exists

    def fake_mtime(jvm, fs, path):
        calls["mtime"] += 1
        if calls["mtime"] == 1:
            return time.time() - 9999  # outer stat: looks stale
        return time.time()  # claim re-check: FRESH (beat raced the claim)

    def fake_exists(jvm, fs, path):
        if path == lock:
            calls["exists"] += 1
            if calls["exists"] <= 2:
                raise IOError("transient FS error")
        return real_exists(jvm, fs, path)

    monkeypatch.setattr(cio, "_mtime_s", fake_mtime)
    monkeypatch.setattr(cio, "_exists", fake_exists)

    with _pytest.raises(TimeoutError):
        acquire_table_lock(spark, p, timeout_s=1.0, stale_s=1.0)
    # the FRESH claim was restored to the lock path, never deleted: the
    # live holder still holds, and no .reclaim.* strand is left behind
    assert os.path.exists(lock), (
        "a transient restore error deleted a fresh claim: live holder "
        "lost its lock"
    )
    with open(lock) as fh:
        assert fh.read() == "live-holder-token"
    assert _glob.glob(lock + ".reclaim.*") == []


def test_stale_lock_claim_strands_are_swept(spark, tmp_path):
    """r11 ADVICE fix: a .reclaim.* / .release.* claim file stranded by a
    failed delete (or a waiter that died mid-claim) is swept by the next
    commit's staging vacuum once older than LOCK_STALE_S; a fresh claim
    (an in-flight waiter's) is never touched."""
    from callio_etl_spark.io import LOCK_SUFFIX, atomic_overwrite

    p = str(tmp_path / "sweep_t")
    spark.createDataFrame([(1, "a")], "id long, w string").write.parquet(p)
    stale_claim = p + LOCK_SUFFIX + ".reclaim.deadbeef"
    fresh_claim = p + LOCK_SUFFIX + ".release.cafebabe"
    # r12 ADVICE fix: a claim renamed from an ALREADY-STALE lock inherits
    # the stale mtime — only the creation timestamp in its name proves it
    # is an in-flight waiter's. Must survive the sweep despite aged mtime.
    inflight_from_stale = (
        p + LOCK_SUFFIX + f".reclaim.{int(time.time() * 1000)}.ab12cd34"
    )
    for f in (stale_claim, fresh_claim, inflight_from_stale):
        with open(f, "w"):
            pass
    two_hours_ago = time.time() - 2 * 3600
    os.utime(stale_claim, (two_hours_ago, two_hours_ago))
    os.utime(inflight_from_stale, (two_hours_ago, two_hours_ago))

    atomic_overwrite(
        spark, spark.createDataFrame([(2, "b")], "id long, w string"), p
    )
    assert not os.path.exists(stale_claim), "aged claim strand not swept"
    assert os.path.exists(fresh_claim), "in-flight claim must be untouched"
    assert os.path.exists(inflight_from_stale), (
        "claim with fresh name-embedded creation time must survive the "
        "sweep even when its rename-inherited mtime is stale"
    )
    os.remove(fresh_claim)
    os.remove(inflight_from_stale)


def test_killed_lock_holder_process_is_reclaimed(spark, tmp_path):
    """VERDICT r10 item 4: a GENUINELY killed holder (kill -9 of a real
    subprocess holding the service lock through the real heartbeat, not
    a simulated reclaim). While the holder lives, its heartbeat keeps
    the lock unreclaimable past stale_s; after SIGKILL the beats stop,
    the mtime ages, a waiter reclaims, and the guarded table is fully
    usable — a tick that died before committing left nothing behind."""
    import os as _os
    import signal
    import subprocess
    import sys as _sys

    from callio_etl_spark.io import (
        SERVICE_LOCK_INFIX,
        LOCK_SUFFIX,
        acquire_table_lock,
        release_table_lock,
    )

    idx_path = str(tmp_path / "idx")
    lock_path = idx_path + SERVICE_LOCK_INFIX
    lock_file = lock_path + LOCK_SUFFIX

    holder_src = f"""
import sys, time
sys.path.insert(0, {repr(str(_os.getcwd()))})
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[1]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "1")
    .getOrCreate()
)
from callio_etl_spark.io import acquire_table_lock
acquire_table_lock(spark, {repr(lock_path)}, stale_s=2.0)
print("ACQUIRED", flush=True)
time.sleep(3600)  # hold until killed
"""
    proc = subprocess.Popen(
        [_sys.executable, "-c", holder_src],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # own process group: SIGKILL takes the JVM too
        text=True,
    )
    try:
        line = proc.stdout.readline()
        assert "ACQUIRED" in line, f"holder never acquired (got {line!r})"
        assert os.path.exists(lock_file)

        # live holder: even past stale_s the real heartbeat (a thread in
        # the SUBPROCESS) keeps the lock fresh — a waiter must time out
        time.sleep(2.5)
        import pytest as _pytest

        with _pytest.raises(TimeoutError):
            acquire_table_lock(
                spark, lock_path, timeout_s=1.5, stale_s=2.0
            )
        assert os.path.exists(lock_file)
        assert time.time() - os.path.getmtime(lock_file) < 2.0, (
            "the subprocess heartbeat is not refreshing the lock"
        )

        # kill -9 the WHOLE holder group (python + its JVM): no release
        # runs, no beat survives
        _os.killpg(_os.getpgid(proc.pid), signal.SIGKILL)
        proc.wait(timeout=30)

        # the next waiter reclaims once the mtime ages past stale_s
        t0 = time.time()
        got = acquire_table_lock(spark, lock_path, timeout_s=30, stale_s=2.0)
        waited = time.time() - t0
        assert got == lock_file
        assert waited < 20, f"reclaim took {waited:.1f}s"
        release_table_lock(spark, lock_path)
        assert not os.path.exists(lock_file)

        # and the table the lock guards is fully usable: a real maintain
        # tick (which takes the same service lock) runs end to end
        from callio_etl_spark import snapshots as snap
        from callio_etl_spark.llm_ops.dedup_ops import maintain_band_index

        docs_p = str(tmp_path / "docs")
        snap.snapshot_partition_overwrite(
            spark,
            spark.createDataFrame(
                [(i, f"alpha beta w{i}", str(i % 2)) for i in range(6)],
                "doc_id long, text string, p string",
            ),
            docs_p,
            "p",
            keep_snapshots=5,
        )
        assert (
            maintain_band_index(
                spark, docs_p, idx_path, str(tmp_path / "cur.json")
            )
            is not None
        )
        assert snap.snapshot_read(spark, idx_path).count() > 0
    finally:
        if proc.poll() is None:
            try:
                _os.killpg(_os.getpgid(proc.pid), signal.SIGKILL)
            except Exception:
                pass


def test_commit_fencing_blocks_a_reclaimed_writer(spark, tmp_path):
    """r11 fencing: a writer that stalled past the stale window and lost
    its lock to a reclaim must FAIL its publish (loud RuntimeError at
    the commit point) instead of tearing the new holder's commit; a
    writer whose token is intact publishes normally, and sub-interval
    holds (fired never set) skip the check entirely."""
    import pytest as _pytest

    from callio_etl_spark import io as cio
    from callio_etl_spark.io import (
        acquire_table_lock,
        assert_commit_fencing,
        release_table_lock,
    )

    p = str(tmp_path / "fence_t")
    lock = acquire_table_lock(spark, p, stale_s=0.8)
    rec = cio._LOCK_BEATS[lock]
    fired, mutex = rec["fired"], rec["mutex"]
    assert fired.wait(15), "heartbeat never fired"

    # token intact: the fence passes
    assert_commit_fencing(spark, p)

    # a reclaim re-owned the lock (through the FS API, like a real
    # reclaimer): the fence must refuse the publish. Age the record so
    # the wall-time gate reads the hold as reclaim-eligible (a real
    # steal only happens once the mtime aged past stale_s).
    jvm, fs, _ = cio._hadoop(spark, p)
    with mutex:
        cio._delete(jvm, fs, lock)
        assert cio._try_create_exclusive(
            jvm, fs, lock, content="new-holder-token"
        )
    rec["acquired_at"] -= 3600.0
    with _pytest.raises(RuntimeError, match="commit fencing"):
        assert_commit_fencing(spark, p)
    release_table_lock(spark, p)  # token-checked: leaves the new holder's
    assert os.path.exists(lock)
    os.remove(lock)

    # sub-interval hold: no beat has fired, the fence is a no-op
    lock2 = acquire_table_lock(spark, p)  # default stale_s: beat hours away
    assert_commit_fencing(spark, p)
    release_table_lock(spark, p)
    assert not os.path.exists(lock2)

    # unlocked path: fence is a no-op (caller manages safety)
    assert_commit_fencing(spark, str(tmp_path / "never_locked"))


def test_snapshot_commit_fenced_after_reclaim(spark, tmp_path, monkeypatch):
    """End to end through the real commit path: a snapshot writer whose
    lock is re-owned mid-commit (stolen deterministically inside the
    locked section, before the manifest publish) must abort at the
    commit point and leave the table at its pre-commit version."""
    import pytest as _pytest

    from callio_etl_spark import io as cio
    from callio_etl_spark import snapshots as snap

    p = str(tmp_path / "fence_snap")
    df = spark.createDataFrame([(1, "a")], "k long, d string")
    v1 = snap.snapshot_partition_overwrite(spark, df, p, "d", keep_snapshots=5)

    lock = p + cio.LOCK_SUFFIX
    stolen = {"done": False}
    orig_vac = snap._vacuum_stale_stagings

    def stealing_vac(jvm, fs, path_):
        # runs INSIDE the writer's locked section, before the manifest
        # publish: replace the lock with a reclaimer's (through the FS
        # API, like a real reclaim) and age the holder's record so the
        # fence's wall-time gate reads the hold as reclaim-eligible
        orig_vac(jvm, fs, path_)
        rec = cio._LOCK_BEATS.get(lock)
        if rec is not None and not stolen["done"]:
            with rec["mutex"]:
                cio._delete(jvm, fs, lock)
                assert cio._try_create_exclusive(
                    jvm, fs, lock, content="reclaimer"
                )
                rec["acquired_at"] -= 3600.0
            stolen["done"] = True

    monkeypatch.setattr(snap, "_vacuum_stale_stagings", stealing_vac)
    try:
        with _pytest.raises(RuntimeError, match="commit fencing"):
            snap.snapshot_partition_overwrite(
                spark,
                spark.createDataFrame([(2, "a")], "k long, d string"),
                p,
                "d",
                keep_snapshots=5,
            )
    finally:
        if os.path.exists(lock):
            os.remove(lock)
    assert stolen["done"], "the steal never ran inside the locked section"

    # the table still reads at its pre-commit content
    assert snap.snapshot_versions(spark, p)[-1] == v1
    assert [r["k"] for r in snap.snapshot_read(spark, p).collect()] == [1]


def test_service_fencing_blocks_a_reclaimed_maintainer(spark, tmp_path):
    """r11: the SERVICE-lock twin of commit fencing — a maintainer that
    stalled past the stale window and lost its service lock must abort
    (the maintain/rebuild paths call assert_service_fencing before
    committing index state); young holds and intact tokens pass."""
    import pytest as _pytest

    from callio_etl_spark import io as cio
    from callio_etl_spark.io import (
        acquire_service_lock,
        assert_service_fencing,
        release_service_lock,
    )

    idx = str(tmp_path / "idx")
    lock = acquire_service_lock(spark, idx)
    rec = cio._LOCK_BEATS[lock]
    assert_service_fencing(spark, idx)  # young hold: no-op

    jvm, fs, _ = cio._hadoop(spark, idx)
    with rec["mutex"]:
        cio._delete(jvm, fs, lock)
        assert cio._try_create_exclusive(jvm, fs, lock, content="reclaimer")
    rec["acquired_at"] -= 3600.0
    with _pytest.raises(RuntimeError, match="commit fencing"):
        assert_service_fencing(spark, idx)
    release_service_lock(spark, idx)  # token-checked: leaves the file
    assert os.path.exists(lock)
    os.remove(lock)


def test_recover_needed_gate_matches_recovery_conditions(spark, tmp_path):
    """r13 commit fast path: `_recover_needed` must be False exactly when
    recover_table is a no-op (clean table), and True for each survivable
    crash artifact — a protocol sibling beside the table or a mode
    marker inside it (crash between the final rename and marker delete)."""
    from callio_etl_spark.io import (
        _TABLE_KEEP_MARKER,
        _TABLE_MARKER,
        _hadoop,
        _list_siblings,
        _recover_needed,
        _touch,
        atomic_overwrite,
        recover_table,
    )

    path = str(tmp_path / "t")
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    atomic_overwrite(spark, df, path)
    jvm, fs, _ = _hadoop(spark, path)

    def probe():
        sibs = _list_siblings(jvm, fs, path)
        return _recover_needed(
            jvm, fs, path, {st.getPath().getName() for st in sibs}
        )

    assert probe() is False, "clean table flagged for recovery"

    # marker inside the live table (crash after swap, before marker delete)
    for marker in (_TABLE_MARKER, _TABLE_KEEP_MARKER):
        _touch(jvm, fs, f"{path}/{marker}")
        assert probe() is True, f"{marker} not detected"
        recover_table(spark, path)  # sweeps the stray marker
        assert probe() is False

    # protocol sibling beside the table (crashed writer's staged commit)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(path + ".__staging__"))
    assert probe() is True, "staging sibling not detected"
    recover_table(spark, path)
    assert probe() is False
    assert spark.read.parquet(path).count() == 5


def test_service_lock_default_timeout_is_tick_sized(spark, tmp_path, monkeypatch):
    """r14 review: the tick-sized wait (LOCK_STALE_S + LOCK_TIMEOUT_S)
    is acquire_service_lock's DEFAULT, so bare callers — the band/vector
    index maintainers queueing behind a long rebuild of the same index —
    inherit it instead of the 120 s commit default (which raised the
    same spurious TimeoutError ADVICE r13 flagged for the update_log).
    An explicit timeout_s still wins."""
    from callio_etl_spark import io as cio

    seen: dict[str, float | None] = {}
    real = cio.acquire_table_lock

    def spy(spark_, path, *a, **kw):
        seen["timeout_s"] = kw.get("timeout_s")
        return real(spark_, path, *a, **kw)

    monkeypatch.setattr(cio, "acquire_table_lock", spy)
    p = str(tmp_path / "svc_tbl")
    cio.acquire_service_lock(spark, p)
    cio.release_service_lock(spark, p)
    assert seen["timeout_s"] == cio.LOCK_STALE_S + cio.LOCK_TIMEOUT_S
    cio.acquire_service_lock(spark, p, timeout_s=5.0)
    cio.release_service_lock(spark, p)
    assert seen["timeout_s"] == 5.0
    # ADVICE r14: a caller widening stale_s without timeout_s must get a
    # default wide enough to outlive a dead holder's reclaim window —
    # the default derives from the EFFECTIVE stale window, not the
    # module constant.
    wide = cio.LOCK_STALE_S * 3
    cio.acquire_service_lock(spark, p, stale_s=wide)
    cio.release_service_lock(spark, p)
    assert seen["timeout_s"] == wide + cio.LOCK_TIMEOUT_S
