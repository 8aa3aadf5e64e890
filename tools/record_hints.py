#!/usr/bin/env python3
"""Extract bench_hints.json from a recorded baseline pair.

Usage: record_hints.py <run1.log> <run2.log> [out.json]

Reads the full-precision per-rep diagnostics lines (`"diag":"bench_rep"`)
from each run's sbt log, takes the per-key MEDIAN within each run (the
protocol's own statistic), then the mean of the two run medians — the
"per-key medians of the operative pair" BASELINE.md records. Writes the
flat `{"key": seconds}` artifact Bench.loadHints parses.
"""
import json
import re
import statistics
import sys


def run_medians(path):
    reps, unstable = [], set()
    with open(path) as f:
        for line in f:
            m = re.search(r'\{"diag":"bench_rep".*\}', line)
            if m:
                reps.append(json.loads(m.group(0))["times"])
            m = re.search(r'\{"diag":"bench",.*\}', line)
            if m:
                d = json.loads(m.group(0))
                # Bench's graded median is over OK samples only; the raw
                # per-rep times carry no ok flag, so a key with any errored
                # rep cannot be reproduced from them — refuse rather than
                # record a fast-fail-biased hint
                unstable |= set(d.get("errors", {})) | set(d.get("flaky", []))
    if not reps:
        raise SystemExit(f"no bench_rep diagnostics lines in {path}")
    if unstable:
        raise SystemExit(
            f"{path} has errored/flaky keys {sorted(unstable)} — a baseline "
            "recording must be clean (re-run; the per-rep times of a failed "
            "rep are fail times, not costs)")
    keys = reps[0].keys()
    for i, r in enumerate(reps[1:], start=2):
        if r.keys() != keys:
            diff = sorted(keys ^ r.keys())
            raise SystemExit(
                f"{path} rep {i} covers a different key set than rep 1 "
                f"(symmetric difference: {diff}) — a truncated or mixed log; "
                "re-run the recording")
    return {k: statistics.median(r[k] for r in reps) for k in keys}


def main():
    r1, r2 = run_medians(sys.argv[1]), run_medians(sys.argv[2])
    assert r1.keys() == r2.keys(), "runs cover different key sets"
    out = sys.argv[3] if len(sys.argv) > 3 else "bench_hints.json"
    hints = {k: round((r1[k] + r2[k]) / 2, 2) for k in sorted(r1)}
    with open(out, "w") as f:
        f.write("{\n")
        f.write(",\n".join(f'"{k}": {v}' for k, v in hints.items()))
        f.write("\n}\n")
    print(f"wrote {out}: {len(hints)} keys, total {sum(hints.values()):.1f}s")


if __name__ == "__main__":
    main()
