"""Partial-row-count evidence for the round-5 sketch_agg fix.

Round 4's verdict: ``sketch_by_key`` emitted one sketch row per (Arrow
batch, key), so a hot key's merge group grew with corpus size — the one
corpus-growth-shaped exchange left in the repo.  Round 5 accumulates
per-key state across each task's whole batch iterator (one row per
partition x key) and merges through a partition-salted two-level tree.

This probe measures, on the engine's own zipfian corpus (lang is zipf
s=1 — the hot-key stress, 'en' ≈ half the docs):

- ``old`` partial rows: what the per-batch emit would have produced =
  sum over Arrow batches of distinct keys in the batch (counted exactly,
  without building sketches);
- ``new`` partial rows: actual output of ``sketch_agg._partials_df``;
- the max merge-group fan-in at each level of the salted tree.

Appends a results note to BENCH.md.

Usage: python tools/sketch_partials_probe.py [--docs 200000]
       [--partitions 32] [--arrow-batch 10000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--arrow-batch", type=int, default=10_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(args.arrow_batch))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from biobloom_spark.corpus import generate_corpus
    from biobloom_spark.operators.sketch_agg import _partials_df, sketch_by_key

    corpus = (
        generate_corpus(spark, args.docs, seed=7, num_partitions=args.partitions)
        .cache()
    )
    n_docs = corpus.count()
    keys = [r[0] for r in corpus.select("lang").distinct().collect()]

    # what the old per-(batch, key) emit would have produced, counted
    # exactly: number of (Arrow batch, key) groups per task
    import pandas as pd  # noqa: F401

    def count_batch_groups(batches):
        import pandas as pd

        n = 0
        for pdf in batches:
            n += pdf["lang"].nunique()
        yield pd.DataFrame({"groups": [n]})

    old_rows = int(
        corpus.select("lang")
        .mapInPandas(count_batch_groups, "groups long")
        .agg(F.sum("groups"))
        .collect()[0][0]
    )

    import math

    fanout = max(1, math.isqrt(args.partitions))
    part = _partials_df(corpus, "lang", "text", "tokens", 3, fanout)
    pdfp = part.select("key", "salt").toPandas()
    new_rows = len(pdfp)
    l1_max = int(pdfp.groupby(["key", "salt"]).size().max())
    l2_max = int(pdfp.groupby("key")["salt"].nunique().max())

    # sanity: the fixed path still agrees with exact counters
    got = {r["key"]: r for r in sketch_by_key(corpus, key_col="lang").collect()}
    exact = {
        r["lang"]: r["c"]
        for r in corpus.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    assert {k: got[k]["n_docs"] for k in got} == exact, "counter mismatch"

    note = f"""
## sketch_agg partial granularity (round-5 fix evidence, {args.docs:,} zipfian docs, {args.partitions} partitions, Arrow batch {args.arrow_batch:,})

Corpus: engine-synthesized zipfian web corpus ({n_docs:,} docs, {len(keys)} langs, zipf s=1 — 'en' is the hot key).

| metric | old per-(batch,key) emit | new per-(partition,key) + salted tree |
|---|---|---|
| partial rows into the merge exchange | {old_rows:,} | {new_rows:,} |
| max fan-in of any single merge task | {old_rows // len(keys)}+ (hot key, grows with corpus) | {max(l1_max, l2_max)} (level-1 {l1_max}, level-2 {l2_max}; bounded by partitions/fanout) |

Partial count is now O(partitions x keys) — independent of corpus rows —
and the two-level salted merge (fanout {fanout}) caps every reducer's
input regardless of key skew.  At 10^12 docs / 10^5 tasks the hot key's
merge input drops from ~10^8 rows through one reducer (old) to ~{args.partitions // fanout}
rows per level-1 task and {fanout} rows at level 2.  Bit-identical
HLL/CMS under every fanout (pinned by tests/test_sketch_agg.py).
"""
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"), "a") as f:
        f.write(note)
    print(note)
    spark.stop()


if __name__ == "__main__":
    main()
