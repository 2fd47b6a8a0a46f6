"""Re-record the local bench baseline into BASELINE.md.

Runs ``bench.py`` (best-of-2 per query, noop sink) at sf0.1 and rewrites the
"Recorded local baseline" section of BASELINE.md with the fresh totals and
per-query table. Run this whenever the registry's query count changes so the
driver's 2x bench guard stays meaningful.

Usage:  python tools/record_baseline.py [note]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    note = sys.argv[1] if len(sys.argv) > 1 else "routine re-record"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    bench = json.loads(line)
    timings: dict[str, float] = bench["queries"]

    table = "\n".join(
        f"| {name} | {sec:.2f} |" for name, sec in sorted(timings.items())
    )
    section = (
        "## Recorded local baseline (sf=0.1, local[32])\n\n"
        f"Total: **{bench['value']:.1f} s** across {len(timings)} queries\n"
        "(`bench.py`, noop sink, best-of-2 passes per query after JVM/Python\n"
        "warm-up, per-query GC isolation — steady-state plan execution;\n"
        f"re-recorded: {note}). Subsequent rounds\n"
        "guard at <=2x per the driver contract. Per-query seconds:\n\n"
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
