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
