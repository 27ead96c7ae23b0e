"""Rebuild a scaling-run table from a (possibly partial) run log.

``scaling_bench.py`` streams one JSON line per child run and per
rep-pair weather probe; the composed table only lands in BENCH.md if
the whole run survives.  On a host where sessions (and every process
in them) can be killed at any time, the log is the durable artifact —
this tool recomputes the same med/min estimators and efficiency table
from whatever rep pairs made it to disk.

Usage: python tools/reconstruct_scaling.py /tmp/scale_8m_r5b.log [--phase build]
Prints the BENCH.md-style table plus the raw pairs; does NOT write
BENCH.md (the annotation needs human context: gate line, termination
reason).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--phase", default="build", help="build or categorize")
    args = ap.parse_args()
    key = {"build": "build_s", "categorize": "categorize_s"}[args.phase]

    samples: dict[int, list[float]] = {}
    ceilings: list[float] = []
    gate = None
    for ln in open(args.log):
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            r = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if "launch_ceiling" in r:
            gate = r
        elif "pair_ceiling" in r:
            ceilings.append(r["pair_ceiling"])
        elif key in r:
            samples.setdefault(int(r["cores"]), []).append(float(r[key]))

    if len(samples) != 2:
        sys.exit(f"need exactly 2 core counts in the log, got {sorted(samples)}")
    lo, hi = sorted(samples)
    if hi != 4 * lo:
        sys.exit(f"core counts {lo},{hi} are not N vs 4N")
    n_pairs = min(len(samples[lo]), len(samples[hi]))
    print(f"gate: {gate}")
    print(f"complete rep pairs: {n_pairs} "
          f"({len(samples[lo])}x{lo}c, {len(samples[hi])}x{hi}c children)")
    for c in (lo, hi):
        print(f"  {c}c {args.phase}: {sorted(samples[c])}")
    print(f"  pair ceilings: {ceilings}")
    if n_pairs == 0:
        sys.exit("no complete pair yet")
    tl, th = sorted(samples[lo]), sorted(samples[hi])
    med = lambda v: v[len(v) // 2]
    eff_med = med(tl) / (4 * med(th))
    eff_min = tl[0] / (4 * th[0])
    # n_docs rides every child line; recover it for throughput
    n = None
    for ln in open(args.log):
        if '"n_docs"' in ln:
            n = json.loads(ln.strip())["n_docs"]
            break
    print(f"\n| phase | pages/s @{lo}c (med) | pages/s @{hi}c (med) | eff (med) | eff (min-est) |")
    print("|---|---|---|---|---|")
    print(f"| {args.phase} | {round(n / med(tl), 1) if n else '?'} | "
          f"{round(n / med(th), 1) if n else '?'} | {round(eff_med, 3)} | {round(eff_min, 3)} |")


if __name__ == "__main__":
    main()
