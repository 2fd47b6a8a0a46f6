"""Corpus-curation operator tests (llm_ops/curation.py + the maintenance
sink): oracle parity at sf0.001, the count-min overestimate-only contract,
decontamination threshold semantics, and plan-shape assertions."""

from __future__ import annotations

import pyspark.sql.functions as F

from callio_etl_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR, assert_oracle_match

_load_all()


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF_DIR)


def test_curation_oracle_parity(spark, duck):
    for name in (
        "domain_stats",
        "cross_source_neardup",
        "heavy_hitters_cms",
        "embedding_decontaminate",
        "sink_compact_vacuum",
    ):
        assert_oracle_match(_run(spark, name), duck, REGISTRY[name].oracle)


def test_cms_never_underestimates(spark):
    """Count-min's one-sided error: estimate >= exact for EVERY reported
    token, and the top-1 token's rank is 1."""
    rows = _run(spark, "heavy_hitters_cms").collect()
    assert rows, "heavy hitters must surface on the fixture corpus"
    assert all(r["overest"] >= 0 for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_domain_stats_totals_match_corpus(spark):
    """The per-domain ledger partitions the corpus: doc counts sum to the
    table size and dup_docs never exceeds n_docs."""
    from callio_etl_spark.tables import load_table

    rows = _run(spark, "domain_stats").collect()
    n_total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    for r in rows:
        assert 0 <= r["dup_docs"] <= r["n_docs"]
        assert r["n_unique_docs"] <= r["n_docs"]
        assert 0.0 <= r["dup_ratio"] <= 1.0


def test_decontaminate_hits_respect_threshold_and_split(spark):
    """Every reported train vector is OUTSIDE the eval slice, and its
    max_cosine clears SEM_TAU; eval vectors never appear on the train side."""
    from callio_etl_spark.llm_ops.curation import EVAL_MOD, EVAL_REM
    from callio_etl_spark.llm_ops.similarity import SEM_TAU

    rows = _run(spark, "embedding_decontaminate").collect()
    assert rows, "fixture embeddings must produce contamination hits"
    for r in rows:
        assert r["train_id"] % EVAL_MOD != EVAL_REM
        assert r["first_eval_id"] % EVAL_MOD == EVAL_REM
        assert r["max_cosine"] > SEM_TAU
        assert r["n_eval_hits"] >= 1


def test_cross_source_matrix_is_unordered_upper_triangle(spark):
    rows = _run(spark, "cross_source_neardup").collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["source_a"] < r["source_b"]  # strict: no self-pairs
        assert (r["source_a"], r["source_b"]) not in seen
        seen.add((r["source_a"], r["source_b"]))
        assert r["n_pairs"] >= 1


def test_curation_plans_have_no_global_window(spark):
    """No corpus-sized single-task window anywhere in the family: an
    unpartitioned WindowExec plans behind an ``Exchange SinglePartition``
    (the one-task sort cliff), so its absence is the checkable signature —
    the same assertion the prefix-sum plan tests use (ranked_topk's
    k-bounded window sits on a Coalesce, not a SinglePartition exchange).
    The decontamination join must broadcast the eval side."""
    for name in ("domain_stats", "cross_source_neardup", "heavy_hitters_cms"):
        plan = _run(spark, name)._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, name
    decon = _run(spark, "embedding_decontaminate")
    plan = decon._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_cms_sketch_is_bounded(spark):
    """The sketch aggregate can never exceed DEPTH*WIDTH rows — the
    constant-memory claim, checked on the materialized sketch itself."""
    from callio_etl_spark.llm_ops.curation import (
        CMS_DEPTH,
        CMS_WIDTH,
        _cms_bucket,
    )
    from callio_etl_spark.tables import load_table
    from callio_etl_spark.llm_ops.dedup_ops import TOKEN_RE

    d = load_table(spark, SF_DIR, "documents")
    occ = d.select(
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias(
            "tok"
        )
    )
    sketch = (
        occ.select(
            F.posexplode(
                F.array(*[_cms_bucket(F.col("tok"), i) for i in range(CMS_DEPTH)])
            ).alias("depth", "bucket")
        )
        .groupBy("depth", "bucket")
        .count()
    )
    assert sketch.count() <= CMS_DEPTH * CMS_WIDTH
    buckets = sketch.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    ).collect()[0]
    assert 0 <= buckets["lo"] and buckets["hi"] < CMS_WIDTH
