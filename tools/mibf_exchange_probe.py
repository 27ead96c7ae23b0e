"""One-off probe: measured shuffle-write bytes of the miBF build's claims
exchange (the build's dominant byte mover) at a given corpus size.

Runs one miBF build with the Spark UI enabled and sums per-stage
shuffle-write bytes from the REST status API — the same measurement the
round-4 LSH exchange table used.  Prints one JSON line; paste into
BENCH.md next to the wire-format change it evidences.

Usage: SCALE_CORPUS=/tmp/biobloom_scale_corpus_12 \
       python tools/mibf_exchange_probe.py --cores 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_PATH = os.environ.get("SCALE_CORPUS", "/tmp/biobloom_scale_corpus")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--limit", type=int, default=None, help="optional doc cap")
    args = ap.parse_args()

    from biobloom_spark.operators.mibf import build_mibf
    from biobloom_spark.session import get_spark

    spark = get_spark(
        "mibf_exchange_probe", cores=args.cores, shuffle_partitions=64,
        driver_memory="48g", extra_conf={"spark.ui.enabled": "true"},
    )
    docs = spark.read.parquet(CORPUS_PATH)
    if args.limit:
        docs = docs.limit(args.limit)
    docs = docs.cache()
    n = docs.count()

    t0 = time.perf_counter()
    build_mibf(spark, docs, key_col="lang", occupancy=0.5)
    wall = time.perf_counter() - t0

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    shuffle_write = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    shuffle_read = sum(s.get("shuffleReadBytes", 0) for s in stages)
    print(json.dumps({
        "n_docs": n, "cores": args.cores, "build_wall_s": round(wall, 1),
        "total_shuffle_write_bytes": shuffle_write,
        "total_shuffle_read_bytes": shuffle_read,
        "shuffle_write_mb": round(shuffle_write / 1e6, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
