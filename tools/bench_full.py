"""Full-registry bench one decade above the gate scale.

SCALE_CURVE.json tracks the ~30 heaviest queries across sf0.01/0.1/1;
this tool times EVERY registered query once at sf0.1 and once at the
synthetic sf1 (bench_scale.build_sf1's 10x key-shifted replication), so
regressions that only show a decade above the per-round bench gate —
quadratic residues, occupancy decay, accidental driver collects — are
caught for the whole surface, not just the curated heavy list.

Emits BENCH_SF1.json at the repo root:

    {"sf01_s": {...}, "sf1_s": {...}, "exp": {...},
     "flagged": [{name, exp, cause?}...], "total_sf1_s": N}

exp = log10(t_sf1 / t_sf01); > 1.2 is flagged and must carry a cause
(bench_scale.CAUSES) or be fixed. Small absolute times are noisy — a
query under 0.3 s at sf0.1 is dominated by per-job overhead, so flags
are suppressed below that floor (the exponent is meaningless there).

Usage: python tools/bench_full.py [--rebuild] [--only q1,q2,...]

--only re-times just the named queries and merges them into the existing
BENCH_SF1.json (recomputing exponents, totals, and flags) — the honest way
to refresh the artifact after a targeted plan fix without paying the full
~40-minute sweep.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

from tools.bench_scale import CAUSES, SF1_DIR, build_sf1  # noqa: E402

FLAG_EXP = 1.2       # exponent above which a query needs a cause or a fix
FLAG_FLOOR_S = 0.3   # sf0.1 times below this are overhead-dominated noise


def main() -> None:
    import os

    from callio_etl_spark.registry import all_queries
    from callio_etl_spark.session import get_spark

    if "--rebuild" in sys.argv or not os.path.exists(f"{SF1_DIR}/lineitem.parquet"):
        print("building synthetic sf1 ...", file=sys.stderr)
        build_sf1()

    spark = get_spark("bench-full")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    only: set[str] | None = None
    prior: dict | None = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        unknown = only - queries.keys()
        if unknown:
            sys.exit(f"--only: unknown queries {sorted(unknown)}")
        with open("BENCH_SF1.json") as f:
            prior = json.load(f)

    # JVM/codegen + Arrow warm-up, unmeasured
    for warm in ("fact_staff_daily", "media_features"):
        queries[warm](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    if only is not None:
        queries = {n: f for n, f in queries.items() if n in only}

    results: dict[str, dict[str, float]] = {}
    errors: dict[str, str] = {}
    for sf_key, sf_dir in (("sf01_s", "/root/testdata/sf0.1"), ("sf1_s", SF1_DIR)):
        times: dict[str, float] = {}
        for name, fn in queries.items():
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # record, keep benching the rest
                errors[f"{sf_key}:{name}"] = str(exc).splitlines()[0][:200]
                print(f"{sf_key} {name}: ERROR {errors[f'{sf_key}:{name}']}",
                      file=sys.stderr)
                continue
            times[name] = round(time.perf_counter() - t0, 3)
            print(f"{sf_key} {name}: {times[name]}s", file=sys.stderr)
        results[sf_key] = times

    if prior is not None:
        for sf_key in ("sf01_s", "sf1_s"):
            merged = dict(prior[sf_key])
            merged.update(results[sf_key])
            results[sf_key] = merged
        errors = {
            k: v for k, v in prior.get("errors", {}).items()
            if k.split(":", 1)[1] not in only
        } | errors

    exp = {
        n: round(math.log10(results["sf1_s"][n] / results["sf01_s"][n]), 2)
        for n in results["sf1_s"]
        if results["sf01_s"].get(n, 0) > 0
    }
    flagged = [
        {"name": n, "exp": e, "sf1_s": results["sf1_s"][n],
         **({"cause": CAUSES[n]} if n in CAUSES else {})}
        for n, e in sorted(exp.items(), key=lambda kv: -kv[1])
        if e > FLAG_EXP and results["sf01_s"].get(n, 0) >= FLAG_FLOOR_S
    ]
    out = {
        "replicas": 10,
        "n_queries": len(results["sf1_s"]),
        "total_sf1_s": round(sum(results["sf1_s"].values()), 1),
        "total_sf01_s": round(sum(results["sf01_s"].values()), 1),
        "flag_exp": FLAG_EXP,
        "flag_floor_s": FLAG_FLOOR_S,
        "errors": errors,
        "flagged": flagged,
        "exp": exp,
        "sf01_s": results["sf01_s"],
        "sf1_s": results["sf1_s"],
    }
    with open("BENCH_SF1.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("n_queries", "total_sf1_s", "total_sf01_s", "flagged")},
                     indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
