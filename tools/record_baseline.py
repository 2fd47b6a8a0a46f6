"""Re-record the local bench baseline into BASELINE.md.

Runs ``bench.py`` (best-of-3 per query, noop sink) at sf0.1 and rewrites the
"Recorded local baseline" section of BASELINE.md with the fresh totals and
per-query table. Run this whenever the registry's query count changes so the
driver's 2x bench guard stays meaningful.

Usage:  python tools/record_baseline.py [note]
        python tools/record_baseline.py --from-json <bench_stdout_file> [note]

--from-json reuses a saved bench.py stdout instead of re-running the
~3-minute sweep (e.g. the run that just produced the round artifact).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = list(sys.argv[1:])
    stdout_text = None
    if args and args[0] == "--from-json":
        with open(args[1]) as f:
            stdout_text = f.read()
        args = args[2:]
    note = args[0] if args else "routine re-record"
    if stdout_text is None:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        stdout_text = out.stdout
    # bench.py prints the full per-query line first and a compact
    # truncation-proof summary LAST — take the line that carries "queries".
    candidates = [
        json.loads(l) for l in stdout_text.splitlines() if l.startswith("{")
    ]
    bench = next(b for b in candidates if "queries" in b)
    timings: dict[str, float] = bench["queries"]

    table = "\n".join(
        f"| {name} | {sec:.2f} |" for name, sec in sorted(timings.items())
    )
    cal = bench.get("calibration_s")
    cal_line = (
        f"Host-speed calibration: **{cal:.2f} s** (`calibration_s` — the\n"
        "fixed pure-CPU yardstick bench.py times before the sweep; compare\n"
        "RECORDINGS via total/calibration ratios whenever two recordings'\n"
        "calibrations differ >10%, so ambient shared-host drift never again\n"
        "needs manual forensics).\n\n"
        if cal is not None
        else ""
    )
    section = (
        "## Recorded local baseline (sf=0.1, local[32])\n\n"
        f"Total: **{bench['value']:.1f} s** across {len(timings)} queries\n"
        "(`bench.py`, noop sink, best-of-3 passes per query after JVM/Python\n"
        "warm-up, per-query GC isolation — steady-state plan execution;\n"
        f"re-recorded: {note}). Subsequent rounds\n"
        "guard at <=2x per the driver contract.\n\n" + cal_line +
        "### Accepted jitter band\n\n"
        "Sub-2 s queries carry +-0.3-0.5 s scheduler/GC noise, and run ORDER\n"
        "biases sub-second queries up to ~2x (head-of-run entries pay\n"
        "residual JIT/page-cache warm-up), so per-query ratios are only\n"
        "comparable between runs with the same registry order. Treat a\n"
        "per-query ratio as signal only when the query exceeds ~2 s AND\n"
        ">1.5x, or when the TOTAL moves >10%.\n\n"
        "Per-query seconds:\n\n"
        "| query | sec |\n|---|---|\n" + table + "\n"
    )

    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        text = f.read()
    new = re.sub(
        r"## Recorded local baseline.*\Z", section, text, flags=re.DOTALL
    )
    with open(path, "w") as f:
        f.write(new)
    print(f"recorded {len(timings)} queries, total {bench['value']:.1f}s")


if __name__ == "__main__":
    main()
