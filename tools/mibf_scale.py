"""miBF build/classify scaling evidence (round-3: the build's ownership
merge is now distributed per slot-range segment, so it should scale like
the Bloom build).

Occupancy 0.5 (the reference's MIBFGen -b default): at 1M docs the 0.1
setting used by the sf0.1 driver bench sizes the slot array ~28x the
frame count (gigabytes of uint16 broadcast + first-touch faults) — a
sizing lesson, not an engine property; 0.5 is both the reference default
and the realistic deployment point.  Same protocol as tools/scaling_bench.py: identical job
at N and 4N cores in separate subprocesses, interleaved reps, pure-CPU
calibration alongside, min + median estimators.

Usage:  python tools/mibf_scale.py [--docs 400000] [--reps 2] [--n-cores 2]
Appends a results section to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import CORPUS_PATH, prepare, run_calibration  # noqa: E402


def run_one(cores: int, reps: int) -> dict:
    from biobloom_spark.operators.mibf import build_mibf, classify_mibf
    from biobloom_spark.session import get_spark

    spark = get_spark("mibf_scale", cores=cores, shuffle_partitions=64,
                      driver_memory="48g")
    docs = spark.read.parquet(CORPUS_PATH).cache()
    n = docs.count()
    # untimed warm build: first-touch page faults + codegen (BENCH.md's
    # measured ~150 MB/s fault path would otherwise dominate rep 0)
    sk = build_mibf(spark, docs, key_col="lang", occupancy=0.5)
    classify_mibf(spark, docs, sk, id_col="url").groupBy("assigned").count().collect()

    def sample(fn):
        out = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            out.append(time.perf_counter() - t0)
        return sorted(out)[len(out) // 2]

    build_s = sample(lambda: build_mibf(spark, docs, key_col="lang", occupancy=0.5))
    cat_s = sample(
        lambda: classify_mibf(spark, docs, sk, id_col="url").groupBy("assigned").count().collect()
    )
    spark.stop()
    return {"cores": cores, "n_docs": n, "mibf_build_s": round(build_s, 3),
            "mibf_classify_s": round(cat_s, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--n-cores", type=int, default=2)
    ap.add_argument("--run-cores", type=int, default=None)
    args = ap.parse_args()

    if args.run_cores:
        print(json.dumps(run_one(args.run_cores, args.reps)))
        return

    prepare(args.docs)
    lo, hi = args.n_cores, 4 * args.n_cores
    samples = {lo: [], hi: []}
    for _ in range(args.reps):
        for cores in (lo, hi):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--run-cores", str(cores), "--reps", "1"],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            samples[cores].append(r)
            print(r)
    calib = run_calibration(lo)
    n = samples[lo][0]["n_docs"]
    report = {"n_docs": n, "calibration": calib}
    for phase in ("mibf_build_s", "mibf_classify_s"):
        vals = {c: sorted(s[phase] for s in samples[c]) for c in (lo, hi)}
        med = {c: vals[c][len(vals[c]) // 2] for c in (lo, hi)}
        mn = {c: vals[c][0] for c in (lo, hi)}
        report[phase] = {
            f"median_{lo}c": med[lo], f"median_{hi}c": med[hi],
            f"min_{lo}c": mn[lo], f"min_{hi}c": mn[hi],
            "eff_median": round(med[lo] / (4 * med[hi]), 3),
            "eff_min": round(mn[lo] / (4 * mn[hi]), 3),
            f"pages_per_sec_{hi}c_min": round(n / mn[hi], 1),
        }
    print(json.dumps(report, indent=2))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH.md"), "a") as f:
        f.write("\n```\nmibf_scale " + json.dumps(report) + "\n```\n")


if __name__ == "__main__":
    main()
