"""Manifest metadata-cost curve: per-commit metadata WRITE cost vs leaves.

VERDICT r8 item 5 asked for the driver-side manifest bottleneck to be
either fixed or measured; round 9 did both — this tool is the MEASURE
half. The fixed per-commit machinery (staging write, FS renames, lock)
dominates wall-clock at test scale, so the honest scaling metric is the
METADATA BYTES a commit writes under `__snap__`:

- inline (pre-r9) layout: every commit re-serializes the FULL leaf
  enumeration — O(table) bytes per commit, and keep_snapshots retained
  versions each hold a full copy;
- segmented (r9) layout: a one-leaf commit writes the small top manifest
  plus ONLY the segment holding that leaf — O(touched) bytes; untouched
  segments are shared by hash across the retained history.

For each leaf count the tool bootstraps a one-row-per-leaf table, then
does a ONE-LEAF overwrite commit under both layouts and reports the new
metadata files/bytes that commit created, plus manifest-resolve time.
Writes MANIFEST_BENCH.json at the repo root.

Usage: python tools/bench_manifest.py [leaf counts ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

#: `crossing` as the sole arg skips the curve and re-measures only the
#: seg_n doubling-boundary section.
LEAVES = (
    []
    if sys.argv[1:] == ["crossing"]
    else [int(a) for a in sys.argv[1:]] or [2000, 8000, 32000]
)


def _snap_files(p: str) -> dict[str, int]:
    d = f"{p}/__snap__"
    if not os.path.isdir(d):
        return {}
    return {f: os.path.getsize(f"{d}/{f}") for f in os.listdir(d)}


def main() -> None:
    import pyspark.sql.functions as F

    from callio_etl_spark import snapshots as snap
    from callio_etl_spark.session import get_spark

    spark = get_spark("bench-manifest")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for n in LEAVES:
        row: dict[str, object] = {}
        for mode in ("segmented", "inline"):
            inline_max = 256 if mode == "segmented" else n + 1
            root = tempfile.mkdtemp(prefix=f"callio_manifest_{mode}_")
            p = f"{root}/t"
            # `with` (not manual __enter__/__exit__): an exception in the
            # setup between the two would leak lowered thresholds into
            # every later iteration of this process
            try:
              with snap.segment_thresholds(
                  inline_max, snap._SEGMENT_TARGET_LEAVES
              ):
                  base = (
                      spark.range(n)
                      .select(
                          F.col("id").alias("k"),
                          (F.col("id") * 10).alias("v"),
                          F.col("id").cast("string").alias("p"),
                      )
                      .repartition(64)
                  )
                  snap.snapshot_partition_overwrite(
                      spark, base, p, "p", keep_snapshots=2
                  )
                  before = _snap_files(p)
                  one = spark.createDataFrame(
                      [(10**9, 7, "3")], "k long, v long, p string"
                  )
                  t0 = time.perf_counter()
                  snap.snapshot_partition_overwrite(
                      spark, one, p, "p", keep_snapshots=2
                  )
                  commit_s = time.perf_counter() - t0
                  after = _snap_files(p)
                  new = {f: s for f, s in after.items() if f not in before}
                  row[f"{mode}_commit_new_meta_bytes"] = sum(new.values())
                  row[f"{mode}_commit_new_meta_files"] = len(new)
                  row[f"{mode}_total_meta_bytes"] = sum(after.values())
                  row[f"{mode}_one_leaf_commit_s"] = round(commit_s, 3)
                  # STEADY STATE: this commit DROPS a version from
                  # retention — the vacuum's reclaim sweep runs. Scoped
                  # (newly-dead leaves only) it stays flat in table size;
                  # sweeping the dropped manifest's full enumeration would
                  # cost ~2.5 ms/leaf of listStatus here.
                  one2 = spark.createDataFrame(
                      [(10**9 + 1, 8, "3")], "k long, v long, p string"
                  )
                  t0 = time.perf_counter()
                  snap.snapshot_partition_overwrite(
                      spark, one2, p, "p", keep_snapshots=2
                  )
                  row[f"{mode}_steady_state_commit_s"] = round(
                      time.perf_counter() - t0, 3
                  )
                  snap._SEG_CACHE.clear()
                  t0 = time.perf_counter()
                  m = snap.snapshot_manifest(spark, p)
                  assert len(m["partitions"]) == n
                  row[f"{mode}_manifest_read_s"] = round(
                      time.perf_counter() - t0, 3
                  )
                  # the r10 partial READ path: a point probe on the
                  # partition column resolves top manifest + ONE segment
                  snap._SEG_CACHE.clear()
                  t0 = time.perf_counter()
                  mp_ = snap.snapshot_manifest(spark, p, leaves=["p=3"])
                  assert "p=3" in mp_["partitions"]
                  row[f"{mode}_point_manifest_read_s"] = round(
                      time.perf_counter() - t0, 4
                  )
                  row[f"{mode}_point_segments_loaded"] = sum(
                      1
                      for (sd, _h) in snap._SEG_CACHE
                      if sd == snap._snap_dir(p)
                  )
            finally:
                shutil.rmtree(root, ignore_errors=True)
        out[str(n)] = row
        print(f"leaves={n}: {row}", file=sys.stderr)
    crossing = bench_doubling_crossing(spark, snap, F)
    # subset runs MERGE into the existing file (incremental re-measure)
    prior_all: dict = {}
    if os.path.exists("MANIFEST_BENCH.json"):
        with open("MANIFEST_BENCH.json") as f:
            prior_all = json.load(f)
        prior = prior_all.get("leaves", {})
        prior.update(out)
        out = prior
    doc = dict(prior_all)
    doc["leaves"] = out
    doc["doubling_crossing"] = crossing
    with open("MANIFEST_BENCH.json", "w") as f:
        json.dump(doc, f, indent=2)
    spark.stop()


def bench_doubling_crossing(spark, snap, F) -> dict:
    """VERDICT r10 item 3, measure half: the seg_n DOUBLING boundary is
    the one spill path that re-pays O(table-metadata) driver CPU — a
    full segment recompute instead of hash reuse. Grow a segmented table
    with two SAME-SIZED multi-leaf commits, one inside the current n and
    one crossing it, so their wall-clock difference isolates the
    recompute; then a one-leaf commit proves reuse resumed at the new n.
    It is a single amortized event: boundaries are geometric (n doubles),
    so a table pays it log2(leaves/target) times over its LIFETIME."""
    target = snap._SEGMENT_TARGET_LEAVES  # 2048
    root = tempfile.mkdtemp(prefix="callio_manifest_crossing_")
    p = f"{root}/t"
    row: dict[str, object] = {}
    try:
        with snap.segment_thresholds(256, target):
            def rows(lo, hi):
                return (
                    spark.range(lo, hi)
                    .select(
                        F.col("id").alias("k"),
                        F.col("id").cast("string").alias("p"),
                    )
                    .repartition(64)
                )

            def top(v):
                with open(f"{p}/__snap__/m{v:06d}.json") as f:
                    return json.load(f)

            # 3000 leaves -> n=2; +600 stays n=2; +600 more crosses to n=4
            snap.snapshot_partition_overwrite(
                spark, rows(0, 3000), p, "p", keep_snapshots=2
            )
            t0 = time.perf_counter()
            v_in = snap.snapshot_partition_overwrite(
                spark, rows(3000, 3600), p, "p", keep_snapshots=2
            )
            row["non_crossing_600_leaf_commit_s"] = round(
                time.perf_counter() - t0, 3
            )
            t0 = time.perf_counter()
            v_x = snap.snapshot_partition_overwrite(
                spark, rows(3600, 4200), p, "p", keep_snapshots=2
            )
            row["crossing_600_leaf_commit_s"] = round(
                time.perf_counter() - t0, 3
            )
            row["seg_n_before"] = top(v_in)["seg_n"]
            row["seg_n_after"] = top(v_x)["seg_n"]
            t0 = time.perf_counter()
            v_post = snap.snapshot_partition_overwrite(
                spark,
                spark.createDataFrame([(10**9, "3")], "k long, p string"),
                p,
                "p",
                keep_snapshots=2,
            )
            row["post_crossing_one_leaf_commit_s"] = round(
                time.perf_counter() - t0, 3
            )
            tx, tp = top(v_x), top(v_post)
            row["post_crossing_segments_reused"] = sum(
                1 for a, b in zip(tx["segments"], tp["segments"]) if a == b
            )
            row["leaves_at_crossing"] = 4200
            # the one-leaf commit REPLACES p=3's single row: count holds
            assert snap.snapshot_read(spark, p).count() == 4200
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(f"doubling_crossing: {row}", file=sys.stderr)
    return row


if __name__ == "__main__":
    main()
