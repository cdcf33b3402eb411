#!/usr/bin/env python
"""Three full bench.py runs at sf0.1 -> BENCH_LOCAL_r{N}.json: the
per-query median and max-min spread across runs is the noise-floor
reference the r6 verdict asked for (sub-second movers in the driver
bench are judged against this measured run-to-run spread, not against
zero). Each run is bench.py's min-of-2-iterations per query, in a fresh
JVM per run.

Usage: python scripts/bench_local_noise.py <round> [n_runs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rnd = int(sys.argv[1])
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    runs = []
    for i in range(n_runs):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = out.stdout.strip().splitlines()[-1]
        d = json.loads(line)
        if d.get("errors"):
            sys.exit(f"run {i}: bench errors: {d['errors']}")
        runs.append(d)
        print(f"run {i}: total {d['value']}s, n={d['n_queries']}", flush=True)
    names = sorted(set.intersection(*(set(r["queries"]) for r in runs)))
    med = {
        n: round(statistics.median(r["queries"][n] for r in runs), 3)
        for n in names
    }
    spread = {
        n: round(
            max(r["queries"][n] for r in runs)
            - min(r["queries"][n] for r in runs),
            3,
        )
        for n in names
    }
    artifact = {
        "metric": "catalog_total_runtime_median_of_%d" % n_runs,
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "sf": runs[0]["sf"],
        "n_queries": len(names),
        "runs_total": [r["value"] for r in runs],
        "note": (
            "%d full bench.py runs at sf0.1 on local[32] (2 iterations "
            "each, min-per-query within a run); per-query median across "
            "runs is the noise-floor reference; max-min spread included "
            "so sub-second movers can be judged against measured "
            "run-to-run noise" % n_runs
        ),
        "median_queries": med,
        "spread_queries": spread,
        "per_run_queries": [r["queries"] for r in runs],
    }
    out_path = os.path.join(REPO, f"BENCH_LOCAL_r{rnd:02d}.json")
    with open(out_path, "w") as fh:
        json.dump(artifact, fh)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
