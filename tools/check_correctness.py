"""Local mirror of the driver's t2 correctness gate.

Runs every registered query on Spark and its DuckDB oracle over the same
parquet tables, then compares row count, sorted column names, dtype families,
and cell values (rows sorted canonically). Stricter than a hash: prints the
first differing cells so mismatches are debuggable.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return v.item()
    except ImportError:
        pass
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    return v


def frame_rows(columns, rows):
    cols_sorted = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon(r[i]) for i in cols_sorted) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [columns[i] for i in cols_sorted], out


def values_close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
            return True
        return False
    return str(a) == str(b)


def main() -> int:
    import __spark_entry__ as se
    from callio_etl_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = se.queries(), se.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(s_rows)} rows, no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue

        sc, sr = frame_rows(s_cols, s_rows)
        dc, dr = frame_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL  {name}: columns differ spark={sc} duckdb={dc}")
            failures += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duckdb={len(dr)}")
            failures += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if not all(values_close(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL  {name}: row {i} differs")
            for col, x, y in zip(sc, a, b):
                if not values_close(x, y):
                    print(f"      {col}: spark={x!r} duckdb={y!r}")
            failures += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows, {len(sc)} cols")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
