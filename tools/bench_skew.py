"""Skew demonstration bench: salted_join vs plain join on a hot-key input.

The correctness identity (`salted_join_agg`) proves salting changes no rows;
this artifact proves it changes the RUNTIME shape: with one key holding 95%
of the big side and runtime mitigations off (AQE disabled, broadcast
disabled — isolating the explicit fix), the plain shuffle join serializes
the stage behind the single hot-key task, while salted_join splits that task
n_salts ways. Reports wall-clock AND per-task maxima (duration + input
rows) from the Spark status REST API, so the max-task claim is measured,
not inferred from wall-clock.

Writes SKEW_BENCH.json at the repo root:
  {"rows": N, "hot_frac": f, "n_salts": s,
   "plain":  {"wall_s": w, "max_task_s": m, "task_skew": m / median},
   "salted": {...},
   "speedup_wall": ..., "speedup_max_task": ...}

Usage: python tools/bench_skew.py [n_rows] (default 4_000_000)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def _task_stats(spark, base: str, job_group: str) -> dict:
    """Max/median task duration (seconds) across all stages of the jobs in
    ``job_group``, plus the max task input/shuffle-read record count."""
    app = _rest(base, "applications")[0]["id"]
    tracker = spark.sparkContext.statusTracker()
    stage_ids = set()
    for job_id in tracker.getJobIdsForGroup(job_group):
        info = tracker.getJobInfo(job_id)
        if info:
            stage_ids.update(info.stageIds)
    durations: list[float] = []
    max_records = 0
    for sid in sorted(stage_ids):
        try:
            tasks = _rest(
                base,
                f"applications/{app}/stages/{sid}/0/taskList?length=5000",
            )
        except urllib.error.HTTPError:
            continue  # skipped stage: never ran
        for t in tasks:
            durations.append(t.get("duration", 0) / 1000.0)
            tm = t.get("taskMetrics") or {}
            rec = (tm.get("inputMetrics") or {}).get("recordsRead", 0) + (
                tm.get("shuffleReadMetrics") or {}
            ).get("recordsRead", 0)
            max_records = max(max_records, rec)
    durations.sort()
    return {
        "max_task_s": round(durations[-1], 3) if durations else 0.0,
        "median_task_s": round(durations[len(durations) // 2], 3)
        if durations
        else 0.0,
        "max_task_records": max_records,
        "n_tasks": len(durations),
    }


SKEW_DIR = "/tmp/callio_skew_sf01"


def build_skewed_fixture(src: str = "/root/testdata/sf0.1", dst: str = SKEW_DIR) -> None:
    """sf0.1 with a 95%-hot flagship group key: 95% of events get user_id=1
    AND one single day, so ONE (Ngay, MaNV_id) aggregation group holds 95%
    of the fact table — the worst case for the flagship's first shuffle
    (the day dimension normally diffuses a hot user across dates; collapsing
    it removes that protection on purpose). Dims copied unchanged."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in ("customer", "nation", "orders", "region", "supplier", "part"):
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")
    e = pq.read_table(f"{src}/events.parquet")
    n = e.num_rows
    # deterministic ~95%: (event_id & 127) < 122 -> 122/128 = 95.3%
    hot = pc.less(pc.bit_wise_and(e.column("event_id"), 127), 122)
    user = pc.if_else(hot, pa.scalar(1, pa.int64()), e.column("user_id"))
    ts0 = e.column("ts").slice(0, 1)[0]  # every hot event lands on one day
    ts = pc.if_else(hot, ts0, e.column("ts"))
    e = e.set_column(e.schema.get_field_index("user_id"), e.schema.field("user_id"), user)
    e = e.set_column(e.schema.get_field_index("ts"), e.schema.field("ts"), ts)
    pq.write_table(e, f"{dst}/events.parquet")
    print(f"skewed fixture: {n} events, 95% on (user 1, one day)", file=sys.stderr)


def flagship_mode() -> None:
    """Measure fact_staff_daily itself on the 95%-hot fixture vs stock
    sf0.1 with the PRODUCTION config (AQE on) — per-task maxima from the
    status REST API, same protocol as the salted-join bench. Appends a
    "flagship" section to SKEW_BENCH.json."""
    from pyspark.sql import SparkSession

    from callio_etl_spark.queries.fact_staff_daily import fact_staff_daily
    from callio_etl_spark.session import configure

    build_skewed_fixture()
    spark = configure(
        SparkSession.builder.appName("bench-skew-flagship")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    base = spark.sparkContext.uiWebUrl

    def run(tag: str, sf_dir: str) -> dict:
        spark.sparkContext.setJobGroup(tag, tag)
        t0 = time.monotonic()
        fact_staff_daily(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        spark.sparkContext.setJobGroup("", "")
        stats = _task_stats(spark, base, tag)
        stats["wall_s"] = round(wall, 3)
        if stats["median_task_s"]:
            stats["task_skew"] = round(stats["max_task_s"] / stats["median_task_s"], 1)
        return stats

    run("warmup", "/root/testdata/sf0.001")
    stock = run("flagship-stock", "/root/testdata/sf0.1")
    skewed = run("flagship-skewed", SKEW_DIR)
    out = {}
    try:
        with open("SKEW_BENCH.json") as f:
            out = json.load(f)
    except FileNotFoundError:
        pass
    out["flagship"] = {
        "fixture": "sf0.1 events, 95% of rows on one (user, day) group",
        "config": "production (AQE on, broadcast dims)",
        "stock": stock,
        "skewed": skewed,
        "wall_ratio_skewed_vs_stock": round(skewed["wall_s"] / stock["wall_s"], 2),
        "max_task_records_ratio": round(
            skewed["max_task_records"] / max(stock["max_task_records"], 1), 2
        ),
    }
    print(json.dumps(out["flagship"], indent=2))
    with open("SKEW_BENCH.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


def main() -> None:
    import pyspark.sql.functions as F

    from pyspark.sql import SparkSession

    from callio_etl_spark.io import salted_join
    from callio_etl_spark.session import configure

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_frac, n_salts = 0.95, 16
    hot_n = int(n * hot_frac)

    spark = configure(
        SparkSession.builder.appName("bench-skew")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")  # status REST API source
        .getOrCreate()
    )
    base = spark.sparkContext.uiWebUrl
    # Isolate the explicit fix: no AQE skew split, no broadcast rescue.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    big = (
        spark.range(n, numPartitions=32)
        .select(
            F.when(F.col("id") < hot_n, F.lit(1)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 32), F.col("id")).alias("pad"),
        )
        .localCheckpoint()  # pre-materialize: measure the join, not the gen
    )
    small = (
        spark.range(200_000)
        .select(F.col("id").alias("k"), F.col("id").alias("w"))
        .localCheckpoint()
    )

    def run(tag: str, df) -> dict:
        spark.sparkContext.setJobGroup(tag, tag)
        t0 = time.monotonic()
        # hash agg on top so the join output is consumed, not collected
        df.groupBy().agg(F.count("*"), F.sum(F.length("pad"))).collect()
        wall = time.monotonic() - t0
        spark.sparkContext.setJobGroup("", "")
        stats = _task_stats(spark, base, tag)
        stats["wall_s"] = round(wall, 3)
        if stats["median_task_s"]:
            stats["task_skew"] = round(
                stats["max_task_s"] / stats["median_task_s"], 1
            )
        return stats

    plain = run("plain-join", big.join(small, "k"))
    salted = run("salted-join", salted_join(big, small, "k", n_salts=n_salts))

    out = {
        "rows": n,
        "hot_frac": hot_frac,
        "n_salts": n_salts,
        "plain": plain,
        "salted": salted,
        "speedup_wall": round(plain["wall_s"] / salted["wall_s"], 2),
        "speedup_max_task": round(
            plain["max_task_s"] / max(salted["max_task_s"], 1e-9), 2
        ),
    }
    print(json.dumps(out, indent=2))
    with open("SKEW_BENCH.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()





# --------------------------------------------------------- band-join mode

BAND_DIR = "/tmp/callio_skew_band"


def _write_band_fixture(kind: str, src: str = "/root/testdata/sf0.1") -> str:
    """documents.parquet with 95% hot CONTENT: ``verbatim`` replaces 95% of
    texts with one exact string (the exact-collapse case — the grouped
    form's quotient absorbs it); ``boilerplate`` gives 95% of docs a shared
    40-word template plus one unique token each (distinct texts that still
    share most band keys — the quadratic-bucket case the cap guards)."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    dst = f"{BAND_DIR}_{kind}"
    os.makedirs(dst, exist_ok=True)
    d = pq.read_table(f"{src}/documents.parquet")
    hot = pc.less(pc.bit_wise_and(d.column("doc_id"), 127), 122)  # ~95.3%
    if kind == "verbatim":
        hot_text = pa.scalar(d.column("text")[0].as_py(), pa.string())
        text = pc.if_else(hot, hot_text, d.column("text"))
    elif kind == "boilerplate":
        tmpl = " ".join(f"template{i}word" for i in range(40))
        uniq = pc.binary_join_element_wise(
            pa.scalar(tmpl),
            pc.cast(d.column("doc_id"), pa.string()),
            pa.scalar(" uniq"),
        )
        text = pc.if_else(hot, uniq, d.column("text"))
    else:
        raise ValueError(kind)
    d = d.set_column(d.schema.get_field_index("text"), d.schema.field("text"), text)
    pq.write_table(d, f"{dst}/documents.parquet")
    return dst


def band_mode() -> None:
    """Skew-test the dedup family's band equi-join (the other shuffle that
    meets adversarial data): minhash_lsh_pairs_grouped measured on stock
    sf0.1 vs a 95%-verbatim-hot corpus (the collapse must absorb it: the
    rep set shrinks, so the hot content contributes ONE row per band) and
    vs a 95%-boilerplate corpus (distinct texts sharing band keys — the
    bucket whose pair volume is inherently quadratic, which NO salting or
    AQE split can linearize because the OUTPUT is quadratic), then
    minhash_lsh_pairs_capped on the same boilerplate corpus (the
    production guard: oversized buckets dropped, task profile restored).
    Production config (AQE on). Appends a "band_join" section to
    SKEW_BENCH.json."""
    from pyspark.sql import SparkSession

    from callio_etl_spark.llm_ops.dedup_ops import (
        minhash_lsh_pairs_capped,
        minhash_lsh_pairs_grouped,
    )
    from callio_etl_spark.session import configure

    spark = configure(
        SparkSession.builder.appName("bench-skew-band")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    base = spark.sparkContext.uiWebUrl

    def run(tag: str, fn, sf_dir: str) -> dict:
        spark.sparkContext.setJobGroup(tag, tag)
        t0 = time.monotonic()
        n_out = fn(spark, sf_dir).count()
        wall = time.monotonic() - t0
        spark.sparkContext.setJobGroup("", "")
        stats = _task_stats(spark, base, tag)
        stats["wall_s"] = round(wall, 3)
        stats["out_rows"] = n_out
        if stats["median_task_s"]:
            stats["task_skew"] = round(
                stats["max_task_s"] / stats["median_task_s"], 1
            )
        return stats

    verb = _write_band_fixture("verbatim")
    boil = _write_band_fixture("boilerplate")
    run("warmup", minhash_lsh_pairs_grouped, "/root/testdata/sf0.001")
    stock = run("band-stock", minhash_lsh_pairs_grouped, "/root/testdata/sf0.1")
    verbatim = run("band-verbatim", minhash_lsh_pairs_grouped, verb)
    boiler = run("band-boilerplate", minhash_lsh_pairs_grouped, boil)
    capped = run("band-boiler-capped", minhash_lsh_pairs_capped, boil)

    out = {}
    try:
        with open("SKEW_BENCH.json") as f:
            out = json.load(f)
    except FileNotFoundError:
        pass
    out["band_join"] = {
        "fixture": "sf0.1 documents, 95% hot content (verbatim / boilerplate)",
        "config": "production (AQE on)",
        "operator": "minhash_lsh_pairs_grouped (+ _capped guard)",
        "stock": stock,
        "verbatim_hot": verbatim,
        "boilerplate_hot": boiler,
        "boilerplate_capped": capped,
        "verbatim_wall_ratio_vs_stock": round(
            verbatim["wall_s"] / stock["wall_s"], 2
        ),
        "verbatim_max_task_records_ratio": round(
            verbatim["max_task_records"] / max(stock["max_task_records"], 1), 2
        ),
        "capped_wall_ratio_vs_boiler": round(
            capped["wall_s"] / max(boiler["wall_s"], 1e-9), 2
        ),
        "note": (
            "verbatim-hot must measure ~flat vs stock (exact-collapse "
            "absorbs it); boilerplate-hot is honestly quadratic in the "
            "hot bucket (output-bound — AQE can split the scan but not "
            "shrink the pair count); the BUCKET_CAP guard restores a "
            "flat profile by dropping template buckets"
        ),
    }
    print(json.dumps(out["band_join"], indent=2))
    with open("SKEW_BENCH.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    if "--flagship" in sys.argv:
        flagship_mode()
    elif "--band" in sys.argv:
        band_mode()
    else:
        main()
