"""Flagship reporting queries vs DuckDB oracle at sf0.001 (fast gate; the
driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from callio_etl_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR, assert_oracle_match


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    assert "Ngay" in df.columns


@pytest.mark.parametrize("name", ["fact_staff_daily", "fact_status_pivot"])
def test_flagship_oracle(spark, duck, name):
    _load_all()
    spec = REGISTRY[name]
    assert_oracle_match(spec.fn(spark, SF_DIR), duck, spec.oracle)


def test_zorder_key_interleaves_exactly(spark):
    """The Morton key must deinterleave back to its inputs (bit-exact),
    and z-bucket envelopes must bound BOTH dimensions: max per-bucket x
    and y spans far below the full 1024 range (the property row-group
    pruning relies on; a linear sort's trailing column spans ~full range)."""
    import pyspark.sql.functions as F

    from callio_etl_spark.queries.advanced import zorder_key_col

    df = spark.createDataFrame(
        [(x, y) for x in range(0, 1024, 37) for y in range(0, 1024, 41)],
        "x long, y long",
    )
    z = df.select("x", "y", zorder_key_col(F.col("x"), F.col("y")).alias("zkey"))
    # deinterleave in python and compare
    for r in z.collect():
        x = y = 0
        for i in range(10):
            x |= ((r["zkey"] >> (2 * i)) & 1) << i
            y |= ((r["zkey"] >> (2 * i + 1)) & 1) << i
        assert (x, y) == (r["x"], r["y"])
    env = (
        z.groupBy(F.floor(F.col("zkey") / 4096).alias("b"))
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .agg(F.max("xs").alias("mx"), F.max("ys").alias("my"))
        .collect()[0]
    )
    # a 4096-key z-range covers a 64x64 tile: both spans bounded by 64
    assert env["mx"] <= 64 and env["my"] <= 64, env


def test_incremental_agg_state_merge_equals_recompute(spark):
    """Merging per-key aggregate states from ANY partition of the facts
    must equal the from-scratch aggregate — tested across several split
    points including empty base and empty delta."""
    import pyspark.sql.functions as F

    from callio_etl_spark.tables import load_table
    from tests.conftest import SF_DIR

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice", F.col("o_orderdate").cast("date").alias("d")
    )

    def state(df):
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
            F.min("d").alias("lo"),
            F.max("d").alias("hi"),
        )

    want = sorted(map(tuple, state(o).collect()))
    for split in ["1990-01-01", "1996-06-15", "2000-01-01"]:
        base = state(o.where(F.col("d") < F.lit(split).cast("date")))
        delta = state(o.where(F.col("d") >= F.lit(split).cast("date")))
        merged = (
            base.unionByName(delta)
            .groupBy("o_custkey")
            .agg(
                F.sum("n").alias("n"),
                F.sum("s").cast("decimal(18,2)").alias("s"),
                F.min("lo").alias("lo"),
                F.max("hi").alias("hi"),
            )
        )
        got = sorted(map(tuple, merged.collect()))
        assert got == want, split
