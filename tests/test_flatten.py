"""Flatten chains over reference-shaped fixtures (FIXTURES.md B1/B2)."""

from __future__ import annotations

import pyspark.sql.functions as F

from callio_etl_spark.flatten import flatten_call, flatten_customer


def _raw_customers(spark):
    # B1: nested user struct (group as struct), customFields array with the
    # target key, a list-ish multi value, and a decoy key.
    rows = [
        {
            "_id": "c1",
            "assignedTime": 1704067200000,
            "createTime": 1704067200000,
            "updateTime": 1704153600000,
            "name": "Alice",
            "phone": "0901",
            "user": {"_id": "u1", "name": "Agent A", "group": {"_id": "g1"}},
            "customFields": [
                {"key": "tinh-trang-kh", "val": "có nhu cầu | có nhu cầu |  bận "},
                {"key": "other", "val": "ignore"},
            ],
        },
        {
            "_id": "c2",
            "assignedTime": None,
            "createTime": 1704067200000,
            "updateTime": 1704240000000,
            "name": "Bob",
            "phone": "0902",
            "user": {"_id": "u2", "name": "Agent B", "group": None},
            "customFields": [{"key": "TINH-TRANG-KH ", "val": "thuê bao"}],
        },
        {
            "_id": "c3",
            "assignedTime": 1704326400000,
            "createTime": 1704067200000,
            "updateTime": 1704326400000,
            "name": None,
            "phone": None,
            "user": None,
            "customFields": None,
        },
    ]
    schema = (
        "_id string, assignedTime long, createTime long, updateTime long,"
        " name string, phone string,"
        " user struct<_id:string, name:string, group:struct<_id:string>>,"
        " customFields array<struct<key:string, val:string>>"
    )
    return spark.createDataFrame(rows, schema)


def test_flatten_customer(spark):
    out = flatten_customer(_raw_customers(spark), tenant="PK")
    rows = {r["_id"]: r for r in out.collect()}
    assert rows["c1"]["user_id"] == "u1"
    assert rows["c1"]["user_group_id"] == "g1"
    # P5: trim + order-preserving dedupe + ' | ' join
    assert rows["c1"]["customField_0_val"] == "có nhu cầu | bận"
    # case/space-insensitive key match (utils.py:120)
    assert rows["c2"]["customField_0_val"] == "thuê bao"
    assert rows["c2"]["user_group_id"] is None
    # P8: epoch-ms -> UTC date
    assert str(rows["c1"]["NgayUpdate"]) == "2024-01-02"
    assert rows["c3"]["NgayAssign"] is not None
    # P16 tenant stamp + P7 hash present and distinct across rows
    assert all(r["tenant"] == "PK" for r in rows.values())
    assert len({r["row_hash"] for r in rows.values()}) == 3


def test_row_hash_ignores_volatile_columns(spark):
    df = _raw_customers(spark)
    a = flatten_customer(df, "PK")
    # bump updateTime (volatile, excluded from hash) — hash must not change
    b = flatten_customer(
        df.withColumn("updateTime", F.col("updateTime") + 999), "PK"
    )
    ha = {r["_id"]: r["row_hash"] for r in a.collect()}
    hb = {r["_id"]: r["row_hash"] for r in b.collect()}
    assert ha == hb
    # change a real column — hash must change
    c = flatten_customer(df.withColumn("phone", F.lit("changed")), "PK")
    hc = {r["_id"]: r["row_hash"] for r in c.collect()}
    assert hc != ha


def test_flatten_call_with_dupes(spark):
    rows = [
        {
            "_id": "x1",
            "createTime": 1704067200000,
            "billDuration": 30,
            "startTime": 1704067200000,
            "endTime": 1704067260000,
            "toNumber": "0901",
            "fromUser": {"_id": "u1", "name": "A"},
            "fromGroup": {"_id": "g1"},
        },
        {
            "_id": "x1",  # duplicate id, later createTime
            "createTime": 1704070800000,
            "billDuration": 0,
            "startTime": 1704070800000,
            "endTime": 1704070830000,
            "toNumber": "0901",
            "fromUser": {"_id": "u1", "name": "A"},
            "fromGroup": None,
        },
    ]
    schema = (
        "_id string, createTime long, billDuration long, startTime long,"
        " endTime long, toNumber string,"
        " fromUser struct<_id:string, name:string>, fromGroup struct<_id:string>"
    )
    out = flatten_call(spark.createDataFrame(rows, schema), tenant="PK")
    got = out.collect()
    assert len(got) == 2  # flatten does not dedup — D1/D3 are separate ops
    assert {r["fromUser__id"] for r in got} == {"u1"}
    assert {r["fromGroup__id"] for r in got} == {"g1", None}
    # projection backfilled declared-but-absent columns as NULLs
    assert "hangupCause" in out.columns and all(r["hangupCause"] is None for r in got)


def test_flatten_customer_stringly_user(spark):
    """P6 (safe_eval, utils.py:16-26): the user struct arriving as a JSON
    string or a Python-repr string parses identically (parse_user=True)."""
    rows = [
        ("c1", 1704067200000, '{"_id": "u1", "name": "Agent A", "group": {"_id": "g1"}}'),
        ("c2", 1704067200000, "{'_id': 'u2', 'name': 'Agent B', 'group': {'_id': 'g2'}}"),
        ("c3", 1704067200000, None),
    ]
    df = spark.createDataFrame(rows, "_id string, updateTime long, user string").withColumn(
        "customFields",
        F.lit(None).cast("array<struct<key:string, val:string>>"),
    )
    out = {r["_id"]: r for r in flatten_customer(df, "PK", parse_user=True).collect()}
    assert out["c1"]["user_id"] == "u1" and out["c1"]["user_group_id"] == "g1"
    assert out["c2"]["user_id"] == "u2" and out["c2"]["user_group_id"] == "g2"
    assert out["c3"]["user_id"] is None


def test_parse_permissive_apostrophe_in_value(spark):
    """safe_eval parity (utils.py:16-26): apostrophes embedded in string
    values must survive both arms — JSON payloads keep them inside
    double-quoted strings, and Python-repr payloads double-quote any string
    containing a single quote (repr semantics), so only STRUCTURAL single
    quotes are rewritten."""
    from callio_etl_spark.functions import parse_permissive

    rows = [
        ("j", '{"name": "O\'Brien", "city": "Cork"}'),          # JSON arm
        ("p", "{'name': \"O'Brien\", 'city': 'Cork'}"),          # repr arm
        ("plain", "{'name': 'Alice', 'city': 'Hanoi'}"),         # repr, no quirks
        ("junk", "not a payload"),                               # both arms miss
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "k string, payload string")
    out = {
        r["k"]: r
        for r in df.select(
            "k",
            parse_permissive(
                F.col("payload"), "struct<name:string, city:string>"
            ).alias("u"),
        ).collect()
    }
    assert out["j"]["u"]["name"] == "O'Brien"
    assert out["p"]["u"]["name"] == "O'Brien"
    assert out["p"]["u"]["city"] == "Cork"
    assert out["plain"]["u"]["name"] == "Alice"
    # from_json PERMISSIVE yields an all-NULL struct for unparseable input
    assert out["junk"]["u"]["name"] is None and out["junk"]["u"]["city"] is None
    assert out["none"]["u"] is None
