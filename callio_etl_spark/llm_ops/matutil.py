"""Size-gated materialization for derived count/posting tables.

The r14 analytics reshapes replaced repeated corpus passes with
``localCheckpoint(eager=True)`` materializations of intermediate count
tables (per-doc bigram counts, unigram/vocab tables, TF-IDF postings,
the min-band LSH key table). localCheckpoint holds the blocks in
EXECUTOR BLOCK STORAGE: right for dictionary/vocab-scale tables, but a
posting table is O(distinct (doc, term)) — corpus-scale, not
vocab-scale — and at 100 TB that materialization is a spill-heavy
memory hog (VERDICT r14 item 4; guide §5: caching competes with
execution memory).

``materialize`` keeps the r14 plan shape (one producing pass feeding a
materialized table read k times) but picks the medium by the same
Catalyst-estimate rule ``snapshots._distribute_for_write`` gates on:

- estimate unavailable (the defaultSizeInBytes sentinel band — local
  relations, RDD-backed frames, anything already checkpointed) or below
  the spill threshold -> ``localCheckpoint(eager=True)`` (bench scale:
  every gated table is KB-MB; the plan is byte-identical to r14);
- above the threshold -> write the table to parquet scratch and read it
  back — the artifact an LM/IR pipeline persists anyway (its postings /
  n-gram count tables ARE products), costing one extra scan-from-disk
  per re-read instead of pinning corpus-scale blocks in memory.

Threshold: ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` x
``spark.callio.materialize.spillFactor`` (default 16 -> 1 GiB at the
64 MB advisory default). Both are runtime confs, so a deployment sizes
the gate to its executors without code changes; the factor — not a
fixed byte count — keeps the rule scale-adaptive the same way the
write-distribution gate is. Scratch dirs are created under the system
temp dir and removed at interpreter exit (they must outlive the
returned frame's consumers, which is the rest of the query run).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame

_SCRATCH_DIRS: list[str] = []


def _cleanup_scratch() -> None:  # pragma: no cover - atexit plumbing
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _SCRATCH_DIRS.clear()


atexit.register(_cleanup_scratch)


def _plan_size_estimate(df: DataFrame) -> int | None:
    """Catalyst's optimizer size estimate, or None when the plan is
    stats-less (the >= sentinel/8 band — the same rule as
    snapshots._distribute_for_write, see the ADVICE r14 note there on
    sentinel scaling through Project/Filter)."""
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        sentinel = int(
            df.sparkSession.conf.get(
                "spark.sql.defaultSizeInBytes", str(2**63 - 1)
            )
        )
    except Exception:
        return None
    if est >= sentinel // 8:
        return None
    return est


def materialize(df: DataFrame, label: str = "tbl") -> DataFrame:
    """Materialize a derived table once: localCheckpoint below the spill
    gate (or when the size is unknowable), parquet scratch above it."""
    est = _plan_size_estimate(df)
    spark = df.sparkSession
    try:
        from callio_etl_spark.snapshots import _parse_bytes_conf

        advisory = _parse_bytes_conf(
            spark.conf.get(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "67108864b"
            )
        )
        factor = int(spark.conf.get("spark.callio.materialize.spillFactor", "16"))
    except Exception:
        advisory, factor = 64 * 1024 * 1024, 16
    if est is None or est < advisory * max(1, factor):
        return df.localCheckpoint(eager=True)
    scratch = tempfile.mkdtemp(prefix=f"callio_mat_{label}_")
    _SCRATCH_DIRS.append(scratch)
    df.write.mode("overwrite").parquet(scratch)
    return spark.read.parquet(scratch)
