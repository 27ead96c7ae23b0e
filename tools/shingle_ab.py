"""A/B the shingle-explode expression (guide §1.4 noop isolation).

v0: tokens split + transform(sequence, slice, concat_ws)  (HOF, interpreted)
v1: whitespace-normalize + one regexp_extract_all lookahead pass (codegen)
v2: mapInArrow shingle generation with per-batch dedup (Arrow C kernels)

Each feeds groupBy(lang).countDistinct(shingle) (the distinct_shingles
query) and a bare noop explode, min-of-reps.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
W = 3


def main() -> None:
    from pyspark.sql import functions as F

    from biobloom_spark.session import get_spark
    from biobloom_spark.sources.tables import tokens_col

    spark = get_spark("shingle_ab", cores=32, shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select("lang", "text")

    def v0(d):
        d = d.withColumn("__toks", tokens_col("text"))
        n_frames = F.greatest(F.lit(0), F.size("__toks") - F.lit(W - 1))
        idx = F.when(n_frames > 0, F.sequence(F.lit(1), n_frames)).otherwise(
            F.array().cast("array<int>"))
        sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("__toks", i, W)))
        return d.select("lang", F.explode(sh).alias("shingle"))

    def v1(d):
        norm = F.regexp_replace(F.trim(F.col("text")), F.lit(r"\s+"), F.lit(" "))
        pat = r"(?=((?:\S+ ){" + str(W - 1) + r"}\S+))\S+(?: |$)"
        sh = F.regexp_extract_all(norm, F.lit(pat), F.lit(1))
        return d.select("lang", F.explode(sh).alias("shingle"))

    def v2(d):
        import pyarrow as pa
        import pyarrow.compute as pc
        import numpy as np

        def gen(batches):
            for b in batches:
                lang = b.column("lang")
                txt = b.column("text")
                sp = pc.utf8_split_whitespace(txt)
                flat = pc.list_flatten(sp)
                offs = np.asarray(sp.offsets, dtype=np.int64)
                counts = np.diff(offs)
                f = flat.to_numpy(zero_copy_only=False)
                keep = f != ""
                if not keep.all():
                    # drop edge empties, fix counts
                    drop = ~keep
                    counts = counts - np.add.reduceat(drop.astype(np.int64), offs[:-1] - offs[0]) if len(counts) else counts
                    f = f[keep]
                n = len(f)
                doc_of = np.repeat(np.arange(len(counts)), counts)
                if n >= W:
                    valid = np.ones(n - W + 1, dtype=bool)
                    for k in range(1, W):
                        valid &= doc_of[: n - W + 1] == doc_of[k : n - W + 1 + k]
                else:
                    valid = np.zeros(0, dtype=bool)
                idx = np.flatnonzero(valid)
                parts = [pa.array(f[idx + k]) for k in range(W)]
                seps = pa.array(np.full(len(idx), " ", dtype=object))
                sh = pc.binary_join_element_wise(
                    *[x for pair in zip(parts, [seps] * W) for x in pair][:-1])
                langs = pa.array(np.asarray(lang)[doc_of[idx]]) if len(idx) else pa.array([], type=pa.string())
                tbl = pa.table({"lang": langs, "shingle": sh})
                tbl = tbl.group_by(["lang", "shingle"]).aggregate([]).combine_chunks()
                for rb in tbl.to_batches():
                    yield rb

        return d.mapInArrow(gen, schema="lang string, shingle string")

    variants = {"v0_hof": v0, "v1_regex": v1, "v2_arrow": v2}
    import json
    out = {}
    for name, fn in variants.items():
        # correctness: distinct counts must match v0
        res = sorted(map(tuple, fn(docs).groupBy("lang").agg(
            F.countDistinct("shingle").alias("d")).collect()))
        out[name + "_result"] = res
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(docs).groupBy("lang").agg(F.countDistinct("shingle")).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        te = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            te.append(round(time.perf_counter() - t0, 3))
        out[name] = {"distinct": ts, "explode_noop": te}
    print(json.dumps({k: v for k, v in out.items() if not k.endswith("_result")}))
    r0 = out["v0_hof_result"]
    for name in variants:
        print(name, "MATCH" if out[name + "_result"] == r0 else ("MISMATCH", out[name + "_result"], r0))
    spark.stop()


if __name__ == "__main__":
    main()
