"""Filter construction — the BioBloomMaker job, Spark-native.

Reference lifecycle (/root/reference/BioBloomMaker/BioBloomMaker.cpp:
110-543, traced in SURVEY.md §3.1): size the filter from a counting
pre-pass, then insert every k-mer of every reference sequence, then store
bitmap + metadata.  Single machine, OpenMP threads over a serialized
reader.

Spark lifecycle here:

1. **Sizing pre-pass** — one JVM-side aggregation
   ``groupBy(filter_key).agg(sum(n_frames), count(*))`` (calcExpectedEntries
   analog, BloomFilterGenerator.h:108-141); driver computes (m, h) per key
   from the published formulas (BloomFilterInfo.h:57-76).  Reads only
   (key, text-length) — column pruning reaches the scan.
2. **Partial build** — docs are salted into ``num_buckets`` buckets by
   ``pmod(xxhash64(url), B)`` so a skewed key (english ≫ everything, the
   domain/language power law) spreads over B independent groups;
   ``groupBy(key, bucket).applyInPandas`` builds one partial sketch per
   group in a single Arrow pass (Bloom + HLL + CMS + t-digest + KLL
   simultaneously).  This is the map-side-combine shape: the shuffle moves
   *documents once*; all sketch state after that is tiny.
3. **Two-level merge** — bucket partials OR-merge per (key, bucket % G)
   group, then per key (merge fan-in bounded → no single-reducer hotspot at
   large B).  OR is associative/commutative/idempotent, so retries and
   re-orderings are safe.
4. **Registry write** — one row per filter (bitmap + metadata;
   storeFilter/printInfoFile analog, BloomFilterGenerator.cpp:71,
   BloomFilterInfo.cpp:81-116) plus per-bucket lineage rows; a killed job
   resumes from completed buckets (SURVEY.md §7.3).

At 100 TB: stage 2's shuffle is the only full-data movement; partial state
is ``keys × B`` bitmaps (MBs), so the merge stages are metadata-sized.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import BloomParams, BuildConfig
from ..functions.text import batch_doc_shingles
from ..sketch import (
    BloomSketch,
    CountMinSketch,
    HLLSketch,
    KLLSketch,
    TDigestSketch,
    optimal_hash_num,
    optimal_size_bits,
)
from ..sources.tables import LINEAGE_SCHEMA, PARTIAL_SCHEMA, REGISTRY_SCHEMA

__all__ = ["size_filters", "build_filters", "load_registry"]

_HLL_P = 14
_CMS_W, _CMS_D = 8192, 5


def size_filters(
    docs: DataFrame, key_col: str, text_col: str, params: BloomParams
) -> dict[str, dict]:
    """Sizing pre-pass: per filter key → expected entries and (m, h).

    Expected entries = total frames (upper bound on distinct, exactly the
    reference's choice: it counts every k-mer occurrence,
    BloomFilterGenerator.h:108-141 — duplicates only make the filter
    conservatively large).
    """
    from ..sources.tables import docs_with_frames

    agg = (
        docs_with_frames(docs.select(key_col, text_col), text_col, params.shingle_w)
        .groupBy(key_col)
        .agg(F.sum("n_frames").alias("frames"), F.count(F.lit(1)).alias("docs"))
        .collect()
    )
    h = params.num_hashes or optimal_hash_num(params.fpr)
    out = {}
    for row in agg:
        n = int(row["frames"] or 0)
        m = min(optimal_size_bits(n, params.fpr, h), params.max_bits)
        out[str(row[key_col])] = {
            "expected_entries": n,
            "n_docs": int(row["docs"]),
            "m_bits": m,
            "num_hashes": h,
        }
    return out


def _build_partial_fn(sizing: dict, params: BloomParams, text_col: str, key_col: str,
                      subtract_bits: bytes | None, subtract_meta: tuple | None):
    """applyInPandas kernel: one (filter_id, bucket) group → one partial row.

    Insert loop parity: every frame of every doc inserted, redundancy
    tracked via insertAndCheck semantics (BloomFilterGenerator.h:143-188);
    optional subtract-filter veto skips frames present in the subtract
    sketch (loadFilterSubtract, BloomFilterGenerator.h:217-285).
    """
    w = params.shingle_w

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        filter_id, bucket = str(key[0]), int(key[1])
        meta = sizing[filter_id]
        bloom = BloomSketch(m_bits=meta["m_bits"], num_hashes=meta["num_hashes"])
        hll = HLLSketch(p=_HLL_P)
        cms = CountMinSketch(width=_CMS_W, depth=_CMS_D)
        td = TDigestSketch()
        kll = KLLSketch()
        sub = None
        if subtract_bits is not None:
            sub = BloomSketch.deserialize(subtract_bits, *subtract_meta)
        frames, _offs, tok_hashes, tok_counts = batch_doc_shingles(
            pdf[text_col].to_numpy(), w
        )
        if sub is not None and frames.size:
            frames = frames[~sub.contains_batch(frames)]
        bloom.update_batch(frames)
        hll.update_batch(frames)
        cms.update_batch(tok_hashes)
        lengths = tok_counts.astype(np.float64)
        td.update_batch(lengths)
        kll.update_batch(lengths)
        return pd.DataFrame(
            {
                "filter_id": [filter_id],
                "bucket": [bucket],
                "n_docs": [len(pdf)],
                "n_inserted": [bloom.n_inserted],
                "n_new": [bloom.n_new],
                "n_redundant": [bloom.n_redundant],
                "bitmap": [bloom.serialize()],
                "hll": [hll.serialize()],
                "cms": [cms.serialize()],
                "tdigest": [td.serialize()],
                "kll": [kll.serialize()],
            }
        )

    return fn


def _merge_partials_fn(sizing: dict, out_schema, final: bool, params: BloomParams):
    """applyInPandas kernel merging partial rows (OR bitmaps, max registers,
    add counters, re-compress digests)."""

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        filter_id = str(key[0])
        meta = sizing[filter_id]
        m, h = meta["m_bits"], meta["num_hashes"]
        bloom = BloomSketch(m_bits=m, num_hashes=h)
        hll = HLLSketch(p=_HLL_P)
        cms = CountMinSketch(width=_CMS_W, depth=_CMS_D)
        td = TDigestSketch()
        kll = KLLSketch()
        n_docs = n_ins = 0
        for _, row in pdf.iterrows():
            bloom = bloom.merge(
                BloomSketch.deserialize(
                    bytes(row["bitmap"]), m, h,
                    n_inserted=int(row["n_inserted"]),
                    n_new=int(row["n_new"]),
                    n_redundant=int(row["n_redundant"]),
                )
            )
            if row["hll"] is not None:
                hll = hll.merge(HLLSketch.deserialize(bytes(row["hll"]), p=_HLL_P))
            if row["cms"] is not None:
                cms = cms.merge(CountMinSketch.deserialize(bytes(row["cms"]), _CMS_W, _CMS_D))
            if row["tdigest"] is not None:
                td = td.merge(TDigestSketch.deserialize(bytes(row["tdigest"])))
            if row["kll"] is not None:
                kll = kll.merge(KLLSketch.deserialize(bytes(row["kll"])))
            n_docs += int(row["n_docs"])
            n_ins += int(row["n_inserted"])
        common = {
            "filter_id": [filter_id],
            "n_docs": [n_docs],
            "n_inserted": [n_ins],
            "bitmap": [bloom.serialize()],
            "hll": [hll.serialize()],
            "cms": [cms.serialize()],
            "tdigest": [td.serialize()],
            "kll": [kll.serialize()],
        }
        if not final:
            return pd.DataFrame(
                {
                    **common,
                    "bucket": [int(key[1])],
                    "n_new": [bloom.n_new],
                    "n_redundant": [bloom.n_redundant],
                }
            )[[f.name for f in PARTIAL_SCHEMA.fields]]
        return pd.DataFrame(
            {
                **common,
                "m_bits": [m],
                "num_hashes": [h],
                "shingle_w": [params.shingle_w],
                "target_fpr": [params.fpr],
                "expected_entries": [meta["expected_entries"]],
                "num_entries": [bloom.n_new],
                "redundant_entries": [bloom.n_redundant],
                "approx_fpr": [bloom.approx_fpr()],
                "occupancy_fpr": [bloom.fpr_from_occupancy()],
                "distinct_frames_hll": [hll.estimate()],
            }
        )[[f.name for f in REGISTRY_SCHEMA.fields]]

    return fn


def build_filters(
    spark: SparkSession,
    docs: DataFrame,
    key_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    params: BloomParams | None = None,
    build: BuildConfig | None = None,
    registry_path: str | None = None,
    partials_path: str | None = None,
    job_id: str | None = None,
    subtract: "tuple[bytes, int, int] | None" = None,
    keys: Iterable[str] | None = None,
) -> DataFrame:
    """Build one Bloom filter (+ companion sketches) per value of key_col.

    Returns the registry DataFrame (one row per filter).  When
    ``partials_path`` is set, per-bucket partials are checkpointed there and
    a re-invocation resumes, recomputing only missing (filter, bucket)
    groups — the north rule's mid-build resumability.
    ``subtract`` = (bitmap_bytes, m_bits, num_hashes) veto filter.
    """
    from ..session import ensure_workers

    ensure_workers(spark)
    params = params or BloomParams()
    build = build or BuildConfig()
    job_id = job_id or uuid.uuid4().hex[:12]

    if keys is not None:
        docs = docs.filter(F.col(key_col).isin(list(keys)))
    docs = docs.filter(F.col(key_col).isNotNull() & F.col(text_col).isNotNull())

    sizing = size_filters(docs, key_col, text_col, params)
    if not sizing:
        return spark.createDataFrame([], REGISTRY_SCHEMA)

    sub_bits, sub_meta = (subtract[0], (subtract[1], subtract[2])) if subtract else (None, None)

    # --- stage 2: salted bucketed partial build -------------------------
    bucketed = docs.select(
        F.col(key_col).cast("string").alias("filter_id"),
        F.col(text_col).alias(text_col),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(build.num_buckets))
        .cast("int")
        .alias("bucket"),
    )

    todo = bucketed
    have_partials = None
    if partials_path and os.path.exists(partials_path):
        have_partials = spark.read.parquet(partials_path)
        done_keys = have_partials.select("filter_id", "bucket").distinct()
        todo = bucketed.join(done_keys, on=["filter_id", "bucket"], how="left_anti")

    partial_fn = _build_partial_fn(sizing, params, text_col, "filter_id", sub_bits, sub_meta)
    new_partials = (
        todo.repartition(build.num_buckets, "filter_id", "bucket")
        .groupBy("filter_id", "bucket")
        .applyInPandas(partial_fn, schema=PARTIAL_SCHEMA)
    )

    if partials_path:
        new_partials.write.mode("append").parquet(partials_path)
        partials = spark.read.parquet(partials_path)
        lineage = partials.select(
            F.lit(job_id).alias("job_id"),
            F.lit("partial_build").alias("stage"),
            "filter_id",
            "bucket",
            F.lit("done").alias("status"),
            "n_docs",
            "n_inserted",
        )
        lineage.write.mode("overwrite").parquet(partials_path.rstrip("/") + "_lineage")
    else:
        partials = new_partials

    # --- stage 3: two-level merge ---------------------------------------
    g = max(1, build.merge_groups)
    level1 = (
        partials.withColumn("bucket", F.pmod(F.col("bucket"), F.lit(g)).cast("int"))
        .groupBy("filter_id", "bucket")
        .applyInPandas(_merge_partials_fn(sizing, PARTIAL_SCHEMA, False, params), schema=PARTIAL_SCHEMA)
    )
    registry = level1.groupBy("filter_id").applyInPandas(
        _merge_partials_fn(sizing, REGISTRY_SCHEMA, True, params), schema=REGISTRY_SCHEMA
    )

    if registry_path:
        registry.write.mode("overwrite").parquet(registry_path)
        registry = spark.read.parquet(registry_path)
    return registry


def load_registry(registry_df: DataFrame, order: Iterable[str] | None = None) -> list[dict]:
    """Registry rows → driver-side list ready for broadcast.

    Filter order matters (ordered mode = CLI order,
    /root/reference/BioBloomClassifier.cpp:950-971); default is sorted
    filter_id for determinism.
    """
    rows = {r["filter_id"]: r.asDict() for r in registry_df.collect()}
    ids = list(order) if order else sorted(rows)
    out = []
    for fid in ids:
        r = rows[fid]
        out.append(
            {
                "filter_id": fid,
                "m_bits": int(r["m_bits"]),
                "num_hashes": int(r["num_hashes"]),
                "shingle_w": int(r["shingle_w"]),
                "bitmap": bytes(r["bitmap"]),
                # per-filter FPR used by the binomial kernel
                "fpr": float(max(r["occupancy_fpr"], 1e-300)),
                "target_fpr": float(r["target_fpr"]),
            }
        )
    return out
