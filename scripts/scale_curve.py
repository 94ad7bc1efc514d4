"""Routine 3-point scaling curve (SCALE.md §9): run the headline bench
at every available scale factor on the same box/commit and print the
per-sf totals plus the steepest per-query slopes. Catches scale
regressions the single-sf bench can't see (a hidden O(n^2), a shuffle
that stops being bounded).

Usage: python scripts/scale_curve.py  [sf_dir ...]
Runs bench.py as a subprocess per sf (fresh JVM each — no cross-sf cache
bleed) and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    sf_dirs = sys.argv[1:] or DEFAULT_SFS
    results = {}
    for sf_dir in sf_dirs:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[sf_dir] = json.loads(line)
        print(
            f"{sf_dir}: total={results[sf_dir]['value']}s "
            f"calib={results[sf_dir]['calib_sec']}",
            file=sys.stderr,
        )

    base = results[sf_dirs[0]]
    summary = {
        "metric": "scale_curve",
        "totals": {d: r["value"] for d, r in results.items()},
        "vs_smallest": {
            d: round(r["value"] / base["value"], 3)
            for d, r in results.items()
        },
        "calib_sec": {d: r["calib_sec"] for d, r in results.items()},
        # per-query slope largest-sf / smallest-sf — super-linear growth
        # (slope >> data ratio) is the signature of a scale hazard
        "steepest_queries": dict(
            sorted(
                (
                    (q, round(results[sf_dirs[-1]]["queries"][q] / max(t, 1e-9), 2))
                    for q, t in base["queries"].items()
                    if q in results[sf_dirs[-1]]["queries"]
                ),
                key=lambda kv: -kv[1],
            )[:5]
        ),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
