"""Median-of-three bench artifact builder (r10 VERDICT #4).

The committed ``bench_results.json`` convention used to be "the last
run", which let one noisy host window write the round's durable record
(the r10 driver artifact read 1.18 geomean vs r9 while quiet re-runs
read 0.96). This tool runs ``bench.py`` N times (default 3) as
subprocesses, each writing to its own temp artifact, then composes the
committed record by taking the PER-QUERY MEDIAN across runs — the same
discipline bench.py already applies within a run — and stamps metadata
naming the convention, every run's total, and which run each number
came from is irrelevant by construction (medians are positionless).

Usage:
    python dev/bench_median.py [n_runs]       # default 3
    SPARK_GRAFT_SF_DIR=... python dev/bench_median.py

Writes bench_results.json at the repo root (the committed artifact) and
prints the composed JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    artifacts = []
    totals = []
    for i in range(n_runs):
        out_path = os.path.join(
            tempfile.gettempdir(), f"bench_run_{os.getpid()}_{i}.json"
        )
        env = dict(os.environ, SPARK_GRAFT_BENCH_OUT=out_path)
        print(f"=== bench run {i + 1}/{n_runs} ===", flush=True)
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "bench.py")], env=env
        )
        if rc != 0:
            print(f"run {i + 1} exited {rc}; aborting", file=sys.stderr)
            return rc
        with open(out_path) as fh:
            art = json.load(fh)
        artifacts.append(art)
        totals.append(art["value"])
        os.unlink(out_path)

    # per-query median across runs; a query missing from some run (an
    # isolated error) medians over the runs that have it
    keys = sorted({k for a in artifacts for k in a["queries"]})
    queries = {
        k: round(
            statistics.median(
                a["queries"][k] for a in artifacts if k in a["queries"]
            ),
            3,
        )
        for k in keys
    }
    spreads = {
        k: round(
            max(a["queries"][k] for a in artifacts if k in a["queries"])
            - min(a["queries"][k] for a in artifacts if k in a["queries"]),
            3,
        )
        for k in keys
    }
    # per-query run support: a 0.0 spread over one surviving run is NOT
    # the same signal as a 0.0 spread over all runs (ADVICE r11)
    n_runs_present = {
        k: sum(1 for a in artifacts if k in a["queries"]) for k in keys
    }
    base = artifacts[-1]
    inner_runs = sorted(
        {a.get("timing", {}).get("runs_per_query") for a in artifacts}
        - {None}
    )
    out = {
        "metric": base["metric"],
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": base["sf"],
        "timing": {
            # read from the run artifacts, never hardcoded (ADVICE r11)
            "runs_per_query": (
                inner_runs[0] if len(inner_runs) == 1 else inner_runs
            ),
            "outer_runs": n_runs,
            "n_runs_present": n_runs_present,
            "stat": "median",
            "selection": f"per-query median across {n_runs} full bench.py"
            " runs (r10 VERDICT #4: the committed artifact is no longer"
            " whichever run happened last)",
            "run_totals": totals,
        },
        "spread": spreads,
        "build_breakdown": base.get("build_breakdown", {}),
    }
    errs = {}
    for a in artifacts:
        errs.update(a.get("errors", {}))
    # an error is only real if the query NEVER produced a timing
    errs = {k: v for k, v in errs.items() if k not in queries}
    if errs:
        out["errors"] = errs
    path = os.path.join(REPO, "bench_results.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
