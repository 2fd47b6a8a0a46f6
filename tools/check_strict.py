"""Strict (dtype-sensitive) mirror of the driver's value-hash gate.

The driver compares Spark and DuckDB results by hashing materialized cell
values after sorting columns by name — so an int64 2 vs a float64 2.0 is a
hash MISMATCH even though tools/check_correctness.py's tolerant comparator
passes it (that is exactly how pack_sequences shipped a red row in round 2:
DuckDB HUGEINT // int stays HUGEINT and pandas widens it to float64, while
Spark emits int64). This tool materializes both sides to pandas, sorts
columns and rows canonically, and requires:

- identical pandas dtype *kind* per column (int vs float vs object vs bool);
- exact cell equality — floats bit-for-bit, no tolerance (None/NaN are
  mutually equal since both engines surface SQL NULL that way).

Usage: python tools/check_strict.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # Temporal representation canonicalization (NOT a value tolerance):
    # Spark DATE surfaces as object-dtype datetime.date, DuckDB DATE as
    # datetime64[us] — the same calendar day in two containers. Normalize
    # every temporal column to datetime64[us] so the dtype-kind check and
    # cell compare see representation-free values; a genuinely different
    # day/instant still fails exactly.
    import datetime as _dt

    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "M":
            df[c] = col.astype("datetime64[us]")
        elif col.dtype == object:
            sample = col.dropna()
            if len(sample) and all(
                isinstance(v, (_dt.date, _dt.datetime)) for v in sample.head(20)
            ):
                df[c] = pd.to_datetime(col).astype("datetime64[us]")
    # Canonical row order: stringified tuple sort (mirrors an
    # order-insensitive hash; both sides sort identically).
    if len(df):
        key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
        df = df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def _cell_eq(a, b) -> bool:
    a_null = a is None or (isinstance(a, float) and math.isnan(a))
    b_null = b is None or (isinstance(b, float) and math.isnan(b))
    if a_null or b_null:
        return a_null and b_null
    if type(a) is not type(b):
        # bool is an int subclass; numpy scalars were unboxed by .item()
        return False
    return a == b


def main() -> int:
    import __spark_entry__ as se
    from callio_etl_spark.session import get_spark

    spark = get_spark("check-strict")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = se.queries(), se.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            ddf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: execution error: {exc}")
            failures += 1
            continue
        s, d = _canon_frame(sdf), _canon_frame(ddf)
        if list(s.columns) != list(d.columns):
            print(f"FAIL  {name}: columns spark={list(s.columns)} duckdb={list(d.columns)}")
            failures += 1
            continue
        kind_bad = [
            (c, s[c].dtype, d[c].dtype)
            for c in s.columns
            if s[c].dtype.kind != d[c].dtype.kind
        ]
        if kind_bad:
            print(f"FAIL  {name}: dtype kind mismatch {kind_bad}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL  {name}: rowcount spark={len(s)} duckdb={len(d)}")
            failures += 1
            continue
        bad = None
        s_rows, d_rows = s.to_numpy(dtype=object), d.to_numpy(dtype=object)
        for i in range(len(s_rows)):
            for j, c in enumerate(s.columns):
                x, y = s_rows[i][j], d_rows[i][j]
                try:
                    x = x.item() if hasattr(x, "item") else x
                    y = y.item() if hasattr(y, "item") else y
                except ValueError:
                    pass  # arrays: fall through to list compare
                if hasattr(x, "tolist"):
                    x = x.tolist()
                if hasattr(y, "tolist"):
                    y = y.tolist()
                if isinstance(x, list) or isinstance(y, list):
                    if list(x or []) != list(y or []):
                        bad = (i, c, x, y)
                        break
                    continue
                if not _cell_eq(x, y):
                    bad = (i, c, x, y)
                    break
            if bad:
                break
        if bad:
            i, c, x, y = bad
            print(
                f"FAIL  {name}: row {i} col {c}: "
                f"spark={x!r} ({type(x).__name__}) duckdb={y!r} ({type(y).__name__})"
            )
            failures += 1
        else:
            print(f"PASS  {name}: {len(s)} rows strict-equal")
    spark.stop()
    print(f"strict: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
