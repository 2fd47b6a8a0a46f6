"""Query registry backing the driver contract (__spark_entry__.py).

Each registered query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB oracle SQL string over the same parquet tables. The driver
compares row-count + schema + order-insensitive value-hash at sf=0.01, so:

- every computed column is aliased identically on both sides;
- double aggregates go through DECIMAL so both engines produce the exact same
  value regardless of accumulation order (`sum(cast(x as decimal))` is exact);
- nondeterministic picks (ANY_VALUE) are replaced by MIN/MAX so results are
  order-independent;
- ties in top-k / row_number orderings always carry a unique key tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: list[str] = field(default_factory=list)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: list[str] | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags or [])
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from callio_etl_spark.queries import (  # noqa: F401
        advanced,
        data_quality,
        fact_staff_daily,
        functions_ext,
        merge_queries,
        relational,
        scalars,
        subqueries,
        tpch,
    )
    from callio_etl_spark.llm_ops import (  # noqa: F401
        chunking,
        dedup_ops,
        sampling,
        similarity,
        text_analysis,
        multimodal,
    )

    _LOADED = True
