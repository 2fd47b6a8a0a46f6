"""Two-point-plus scale curve for the heaviest queries.

The per-round bench (bench.py) measures every query at one scale; this tool
measures HOW the heavy ones scale. It times the heaviest registered queries
at the two largest shipped scales (sf0.01, sf0.1) and at a synthetic sf1 —
a 10x replication of sf0.1 built with pyarrow (types preserved bit-exactly,
fact keys shifted per replica so joins keep their selectivity; dimension
tables unchanged, as a real 10x corpus would behave). Emits per-query
times and the observed scale exponent between consecutive decades:

    exponent = log10(t_bigger / t_smaller)   (1.0 = perfectly linear)

Small-scale times carry fixed session/planning overhead, so exponents from
sf0.01 are understated; the sf0.1 -> sf1 column is the honest one. Known
super-linear operators get a ``cause`` note — candidate-pair generators
(embedding_lsh_pairs, embedding_neardup_bucketed) cost sum(bucket_size^2):
with the plane/cell count FIXED, 10x rows per bucket means ~100x pairs. In
production the bucket count grows with the corpus (more hyperplanes / IVF
cells) precisely to hold occupancy, and hence this term, constant.

Writes SCALE_CURVE.json at the repo root.

Usage: python tools/bench_scale.py [--rebuild]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

SF1_DIR = "/tmp/callio_scale_sf1"
REPLICAS = 10
KEY_OFFSET = 100_000_000  # far above any real key at sf0.1

# table -> columns shifted by replica * KEY_OFFSET (fact/entity keys; FK
# pairs shift together so per-replica joins match exactly like the original)
SHIFT: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation", "part", "supplier"]

# the heaviest queries of BENCH_r04 (>= ~0.7 s at sf0.1), minus
# ann/brute baselines that are documented as within-bucket scorers
HEAVY = [
    "stat_moments",
    "tpch_q1_pricing",
    "fact_staff_daily_sql",
    "contamination_check",
    "corpus_filter",
    "join_fanout",
    "sink_partition_delete",
    "embedding_lsh_buckets",
    "embedding_lsh_pairs",
    "embedding_neardup_bucketed",
    "exists_subquery",
    "profile_columns",
    # r5 additions: the cumulative/pair-join operators worth a curve
    "corpus_select_budget",
    "shard_manifest",
    "semantic_dedup",
    "ann_topk_ivf_probe",
    # r5 late additions: the explode-heavy / multi-stage curation operators
    "dedup_span_removal",
    "dsir_importance",
    "ann_topk_pq_rerank",
    "pmi_cooccurrence",
    # r5 closing additions: moment aggregates, delta-vs-index probe, retrieval
    "embedding_covariance",
    "embedding_pca_project",
    "minhash_incremental_planned",
    "bm25_topk",
    "vocab_coverage",
    # r6: the registered scale-path variants + their held-occupancy runs
    "semantic_dedup_gemm",
    "minhash_incremental_grown",
    "embedding_neardup_cells",
    "minhash_incremental_held",
    "embedding_neardup_held",
    # r9: the r8 storage machinery (VERDICT r8 item 3 — plan-asserted but
    # not decade-measured until now) + the r9 registrations
    "sink_bucketed_snapshot",
    "sink_spec_evolve",
    "sink_rename_evolve",
    "ivm_refresh_join",
    "sink_widen_evolve",
    "maintain_band_index",
    "maintain_vector_index",
    "stream_ingest_band_index",
    "maintain_band_index_planned",
    # r10: the rebuild verbs (the deliberate O(corpus) compaction-cadence
    # pass around O(delta) ticks), the composed IVF streaming loop, and
    # the explicit O(table) orphan walk
    "rebuild_band_index",
    "rebuild_vector_index",
    "stream_ingest_vector_index",
    "sink_remove_orphans",
    # r11: the HTTP production-loop compositions (endpoint-bound)
    "http_incremental_loop",
    "http_loop_snapshot_sink",
    # r12/r13: update_log retention (log is groups-sized, not data-sized)
    # and the audit-vocabulary roundtrip (commit-latency floor + linear
    # staging/append writes)
    "checkpoint_log_compact",
    "update_log_modes",
]

def _minhash_geometry(rows_per_band: int, n_bands: int):
    def run(spark, sf_dir):
        from callio_etl_spark.llm_ops.dedup_ops import incremental_pairs_banded
        from callio_etl_spark.tables import load_table, spread

        d = spread(load_table(spark, sf_dir, "documents"))
        return incremental_pairs_banded(d, rows_per_band, n_bands)

    return run


def _neardup_bits(extra_bits: int):
    def run(spark, sf_dir):
        from callio_etl_spark.llm_ops.dedup_ops import neardup_cells_pairs

        return neardup_cells_pairs(spark, sf_dir, extra_bits)

    return run


#: Held-occupancy variants: the SAME operator with its index geometry grown
#: per scale, the production policy the fixed-knob registered forms hold
#: constant for oracle parity. The exponent across the decade is then the
#: honest scaling of the *policy*, not of a deliberately-frozen index.
HELD: dict[str, dict[str, object]] = {
    # band keys lengthen (2 rows/band -> 4) as the index 10x-es, holding
    # bucket occupancy ~constant; now the registered policy of
    # minhash_incremental_planned (the fixed-(2,4) form measured 1.57)
    "minhash_incremental_held": {
        "0.01": _minhash_geometry(2, 4),
        "0.1": _minhash_geometry(2, 4),
        "1": _minhash_geometry(4, 2),
    },
    # cell count grows 2^bits with the corpus (0 bits = the 10 label cells
    # of embedding_neardup_bucketed; 3 bits = 80 cells at 10x the rows)
    "embedding_neardup_held": {
        "0.01": _neardup_bits(0),
        "0.1": _neardup_bits(0),
        "1": _neardup_bits(3),
    },
}

CAUSES = {
    "http_loop_snapshot_sink": (
        "endpoint-bound like http_incremental_loop plus two manifest "
        "publishes; sub-linear (exp 0.76) because the fixed per-tick "
        "commit/job latency amortizes as the served corpus grows"
    ),
    "http_incremental_loop": (
        "two full HTTP corpus walks (tick 1 + tick 2 delta) against the "
        "in-process single-threaded endpoint plus ~8 small sequential "
        "jobs (dedup window, MERGE, checkpoint scalars, result collect): "
        "wall-clock reads endpoint throughput + fixed per-tick job "
        "latency, not engine scaling — the Spark plan is bisected "
        "parallel slices, one window pass, and an O(delta + touched "
        "target) MERGE."
    ),
    "api_http_ingest": (
        "wall-clock reads the ENDPOINT's throughput, not engine work: the "
        "in-process single-threaded HTTP server serves 10x the rows over "
        "10x the pages (plus the driver collect that seeds it); the Spark "
        "side is N bisected slices fetched in parallel + one distributed "
        "agg. Against a production endpoint the same plan saturates "
        "whatever the API will serve."
    ),
    "rebuild_band_index": (
        "the DELIBERATE O(corpus) pass: seed build + growth tick + full "
        "re-band at the re-planned geometry + adversarial tick — the "
        "compaction-cadence verb around O(delta) ticks; at any sf the "
        "wall-clock floor is ~8 sequential snapshot commits' latency, so "
        "the decade exponent reads the commit floor, not the data."
    ),
    "rebuild_vector_index": (
        "same shape on the vector side: refusal roundtrip + full "
        "broadcast-argmax re-assignment + two-table overwrite x several "
        "ticks; fixed multi-commit latency floor dominates below cluster "
        "scale."
    ),
    "stream_ingest_vector_index": (
        "two real Structured Streaming ticks, each a snapshot commit + "
        "CDC index tick across postings and forward map — fixed "
        "commit-latency floor at ANY scale factor, the same analysis as "
        "stream_ingest_band_index (r9)."
    ),
    "sink_remove_orphans": (
        "the explicit O(table-leaves) maintenance walk (8 leaves here + "
        "two injected strands): cost is the per-leaf listStatus sweep, "
        "deliberately split out of per-commit vacuums; commit/inject "
        "latency dominates at test scale."
    ),
    "semantic_dedup": (
        "COLLAPSED late r6 (exp 2.09 -> -0.28): the pair join now runs "
        "over distinct (label, vector) content groups, so verbatim "
        "re-ingest costs a window row, not a re-score. The residual "
        "within-cluster sum(distinct^2) law keeps its mitigations: grow "
        "the cluster count with the corpus; semantic_dedup_arrow's GEMM "
        "constant."
    ),
    "embedding_lsh_pairs": (
        "candidate-pair generator: cost is sum(bucket^2); plane count fixed "
        "at 8 for oracle parity, so 10x rows/bucket -> ~100x pairs. "
        "Production adds planes as the corpus grows to hold occupancy."
    ),
    "embedding_neardup_bucketed": (
        "same sum(bucket^2) law over the 10 IVF labels; production grows "
        "the cell count with the corpus."
    ),
    "ann_topk_pq_rerank": (
        "subset runs take ONE sf1 pass, which pays the one-time PQ index "
        "training/encode (session-memoized otherwise: train once, serve "
        "many); the serving path itself is linear in bucket size with the "
        "10 cells held fixed."
    ),
    "minhash_incremental_planned": (
        "the size-driven occupancy policy AS the registered operator: the "
        "planner lengthens band keys as the index crosses each integer "
        "size threshold ((2,4) at sf0.1 -> (4,2) at sf1), holding bucket "
        "occupancy and the linear-in-the-delta probe contract the held "
        "harness run measured (exp 1.57 fixed -> ~1.13 held). Residual "
        "super-linearity on the synthetic sf1 is OUTPUT-bound (verbatim "
        "10x replication grows true pairs ~44x)."
    ),
    "semantic_dedup_gemm": (
        "same sum(cluster^2) pair count as semantic_dedup but scored via "
        "blocked BLAS — the constant collapses; the law falls to growing "
        "the cluster count with the corpus."
    ),
    "minhash_incremental_held": (
        "the occupancy-held policy: band keys lengthen (2->4 rows/band) "
        "across the sf0.1->sf1 decade — exponent falls 1.57 -> 1.13, and "
        "the residual is OUTPUT-bound, not plan-bound: the synthetic sf1 "
        "replicates every document 10x verbatim, so TRUE candidate pairs "
        "grow 44x (output exponent 1.65 > runtime exponent 1.13 — work "
        "per emitted pair fell). On a corpus whose duplicate density does "
        "not grow with size, the held geometry is linear in the delta."
    ),
    "minhash_incremental_grown": (
        "the grown (4 rows/band x 2 bands) geometry measured at FIXED "
        "geometry across the decade — the registered correctness anchor "
        "for the parameterization; the per-scale-grown policy is "
        "minhash_incremental_held."
    ),
    "embedding_neardup_cells": (
        "1 extra sign-bit (20 cells) held fixed across the decade for "
        "oracle parity — sum(cell^2) with fixed cells; the per-scale-grown "
        "policy is embedding_neardup_held (exp 0.71)."
    ),
    "embedding_neardup_held": (
        "the corpus-proportional-cells policy: 0 extra bits at sf0.1, 3 at "
        "sf1 (10x rows / 8x cells), holding per-cell occupancy — the "
        "before (10 fixed cells) is embedding_neardup_bucketed."
    ),
    "minhash_lsh_pairs": (
        "OUTPUT-bound: the registered result IS the candidate-pair list, "
        "and the synthetic sf1 replicates every document 10x verbatim, so "
        "TRUE pairs grow ~44x (every replica pairs with every other) — no "
        "plan can emit quadratically more rows in linear time. The "
        "recall-tuned 2-row bands also admit most pairs on this "
        "vocabulary-degenerate corpus. The consumer path (dedup_pipeline) "
        "does NOT pay this: its exact-collapse removes verbatim replicas "
        "before the pair join (exp 1.49 -> ~0)."
    ),
    "embedding_neardup": (
        "the documented brute-force RECALL BASELINE (all-pairs cosine "
        "within label) kept registered as the yardstick the bucketed/"
        "cells/held variants are measured against; production uses "
        "embedding_neardup_bucketed / embedding_neardup_held (exp 0.71)."
    ),
    "cross_source_neardup": (
        "FIXED late r6 (exp 1.73 -> -0.14): pair counts now factor over "
        "exact-text groups (cnt_Xs * cnt_Yt arithmetic on the cell table), "
        "so the band self-join runs on one rep per group and verbatim "
        "duplication cannot square the bucket sizes."
    ),
    "range_join_bucketed": (
        "FIXED late r6 (commit 8153e4e, exp 1.63 -> ~0.4 / 28.3 s -> "
        "~2.5 s): the interval join now runs at the DISTINCT-timestamp "
        "grain — pre-aggregate events to (ts, cnt), bin-join those, fan "
        "the per-ts counts back out by event_id. The synthetic sf1's "
        "replicas share timestamps, so the distinct-ts table does not "
        "grow at all and the old density-quadratic bin law "
        "sum(|bin_a| x |bin_b|) applies to a constant-size input; "
        "property-tested against brute force. Residual cost is the two "
        "linear passes (collapse + fan-out)."
    ),
    "embedding_decontaminate": (
        "FIXED late r6 (exp 1.45 -> 0.35): both sides dedup by vector "
        "content before scoring, so replicated ingest costs a hash-agg "
        "row instead of a re-score; in production the eval side is also "
        "fixed-size (a benchmark suite), keeping the broadcast constant."
    ),
}


def build_sf1(src: str = "/root/testdata/sf0.1", dst: str = SF1_DIR) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in COPY:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")
    for t, keys in SHIFT.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        parts = []
        for r in range(REPLICAS):
            rep = base
            if r:
                for k in keys:
                    i = rep.schema.get_field_index(k)
                    shifted = pc.add(rep.column(k), pa.scalar(r * KEY_OFFSET))
                    rep = rep.set_column(
                        i, rep.schema.field(i), shifted.cast(rep.schema.field(i).type)
                    )
            parts.append(rep)
        pq.write_table(pa.concat_tables(parts), f"{dst}/{t}.parquet")


def main() -> None:
    from callio_etl_spark.registry import all_queries
    from callio_etl_spark.session import get_spark

    # optional positional query names: measure only that subset and MERGE
    # into an existing SCALE_CURVE.json (incremental curve extension)
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    heavy = only or HEAVY

    if "--rebuild" in sys.argv or not os.path.exists(f"{SF1_DIR}/lineitem.parquet"):
        print("building synthetic sf1 ...", file=sys.stderr)
        build_sf1()

    spark = get_spark("bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # JVM/codegen + Arrow-worker warm-up, unmeasured
    for warm in ("fact_staff_daily", "media_features"):
        queries[warm](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    scales = [
        ("0.01", "/root/testdata/sf0.01", 3),
        ("0.1", "/root/testdata/sf0.1", 3),
        # subset (incremental) runs take one sf1 pass: the quadratic
        # pair-join entries are minutes per pass there, and best-of-N is a
        # small-noise refinement the big point doesn't need
        ("1", SF1_DIR, 1 if only else 2),
    ]
    results: dict[str, dict] = {name: {} for name in heavy}
    for sf, sf_dir, passes in scales:
        for name in heavy:
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.2)
            fn = HELD[name][sf] if name in HELD else queries[name]
            best = float("inf")
            for _ in range(passes):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            results[name][sf] = round(best, 3)
            print(f"sf{sf} {name}: {results[name][sf]}s", file=sys.stderr)

    out = {"replicas": REPLICAS, "queries": {}}
    if only and os.path.exists("SCALE_CURVE.json"):
        with open("SCALE_CURVE.json") as f:
            prior = json.load(f)
        # carry EVERY prior top-level key (e.g. the r11 `flagged`
        # yardstick section) — a subset re-measure must never shrink
        # the artifact
        out.update({k: v for k, v in prior.items() if k != "queries"})
        out["queries"] = prior.get("queries", {})
    for name in heavy:
        r = results[name]
        row: dict = dict(r)
        if r.get("0.1") and r.get("0.01"):
            row["exp_001_to_01"] = round(math.log10(r["0.1"] / r["0.01"]), 2)
        if r.get("1") and r.get("0.1"):
            row["exp_01_to_1"] = round(math.log10(r["1"] / r["0.1"]), 2)
        if name in CAUSES:
            row["cause"] = CAUSES[name]
        out["queries"][name] = row
    print(json.dumps(out, indent=2))
    with open("SCALE_CURVE.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
