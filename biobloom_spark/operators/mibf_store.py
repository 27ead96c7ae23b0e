"""Parquet-segment miBF store — the miBF lifecycle with NO process ever
holding the full uint16 id array.

``build_mibf`` (operators/mibf.py) distributes resolution and saturation
but still memcpy-assembles the resolved array on the driver and
broadcasts it (or slot-range slices of it) at classify time.  At the
reference's own scale (BioBloomMIMaker writes a multi-GB sdsl vector to
disk and mmaps it — MIBFGen.hpp:156-284 via BioBloomMIMaker.cpp) that is
fine on one big node; at 10^12-document scale the array exceeds driver
memory outright.  This module keeps the resolved filter as a parquet
table of slot-range segments:

- ``build_mibf_store``: claims→ownership resolution lands segment rows
  straight in parquet (``_resolved_segments`` reducers write, the driver
  never sees ids); the saturation scan (``_sharded_lost_slots``) reads
  one segment per pass; the SAT_BIT update is a cogrouped
  ``applyInPandas`` over (segment rows × lost slots).  Driver-side state
  is O(n_segments) metadata only.
- ``classify_mibf_store`` / ``classify_mibf_store_pairs``: the sharded
  classification kernel (``_classify_mibf_sharded``) with segment bytes
  fetched from parquet per pass — executor memory is bounded by one
  segment regardless of filter size.

The on-disk layout is the product line's persistence contract at scale
(the distributed analog of the reference's ``.bf`` + ``_ids.txt``
container): ``{path}/meta`` one-row parquet, ``{path}/segments``
(seg, ids, label_counts, sat_n) parquet.  Segments absent from the table
are all-empty (all-zero) by construction.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sketch.mibf import (
    ID_MASK,
    MIBFSketch,
    SAT_BIT,
    seed_masks_to_arrays,
)
from .mibf import (
    _classify_mibf_sharded,
    _clamp_segments,
    _lost_slots_from_pairs,
    _prep_build,
    _resolved_segments,
    _seg_bounds,
    _sharded_lost_slots,
    _unpack_lost,
)

#: largest total lost-pair payload the store build will broadcast for the
#: one-pass saturation scan; beyond it (or for pre-round-6 resolved
#: checkpoints without the column) the segmented rescan path runs instead
_LOST_BROADCAST_CAP = 64 << 20

__all__ = [
    "MIBFStore",
    "build_mibf_store",
    "load_mibf_store",
    "classify_mibf_store",
    "classify_mibf_store_pairs",
]

_META_SCHEMA = T.StructType(
    [
        T.StructField("m_slots", T.LongType(), False),
        T.StructField("num_hashes", T.IntegerType(), False),
        T.StructField("shingle_w", T.IntegerType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), False),
        T.StructField("seeds", T.ArrayType(T.StringType()), True),
        T.StructField("hash_family", T.StringType(), False),
        T.StructField("canonical", T.BooleanType(), False),
        T.StructField("n_segments", T.IntegerType(), False),
        T.StructField("label_counts", T.BinaryType(), False),  # int64[L+1]
        T.StructField("sat_slots", T.LongType(), False),
    ]
)

_FINAL_SEG_SCHEMA = T.StructType(
    [
        T.StructField("seg", T.IntegerType(), False),
        T.StructField("ids", T.BinaryType(), False),
        T.StructField("label_counts", T.BinaryType(), False),
        T.StructField("sat_n", T.LongType(), False),
    ]
)


def _read_segment(spark: SparkSession, seg_path: str, s: int, lo: int, hi: int) -> bytes:
    """Driver-side fetch of one segment's raw uint16 bytes (absent row =
    all-empty segment).  Segment-sized by contract — the unit the caller
    is about to broadcast anyway."""
    rows = (
        spark.read.parquet(seg_path)
        .filter(F.col("seg") == int(s))
        .select("ids")
        .collect()
    )
    if not rows:
        return b"\x00" * (2 * (hi - lo))
    return bytes(rows[0]["ids"])


@dataclass
class MIBFStore:
    """Handle to a parquet-backed miBF: metadata + segment accessors.
    Everything a classify pass needs except the ids themselves, which
    stay on disk until a slot-range segment is broadcast."""

    path: str
    m_slots: int
    num_hashes: int
    shingle_w: int
    labels: list[str]
    seeds: np.ndarray | None
    hash_family: str
    canonical: bool
    n_segments: int
    label_counts: np.ndarray  # int64[L+1]; [0] = empty slots
    sat_slots: int

    @property
    def bounds(self) -> np.ndarray:
        return _seg_bounds(self.m_slots, self.n_segments)

    @property
    def meta(self) -> tuple:
        return (
            self.m_slots, self.num_hashes, self.shingle_w, self.labels,
            self.seeds, self.hash_family, self.canonical,
        )

    @property
    def ids_nbytes(self) -> int:
        return 2 * self.m_slots

    def seg_fetch(self, spark: SparkSession):
        seg_path = f"{self.path}/segments"
        return lambda s, lo, hi: _read_segment(spark, seg_path, s, lo, hi)

    # -- stats (identical formulas to MIBFSketch, from stored counts) ----
    def per_frame_prob(self) -> np.ndarray:
        """calcFrameProbs analog (MIBFClassifier.hpp:87-88) from the
        per-segment bincounts aggregated at build time — no id scan."""
        counts = self.label_counts.astype(np.float64)
        return 1.0 - (1.0 - counts / self.m_slots) ** self.num_hashes

    def occupancy(self) -> float:
        return float(1.0 - self.label_counts[0] / self.m_slots)

    def saturation_rate(self) -> float:
        occ = self.m_slots - int(self.label_counts[0])
        return float(self.sat_slots / max(1, occ))

    def to_sketch(self, spark: SparkSession) -> MIBFSketch:
        """Assemble the full in-memory MIBFSketch — test-scale escape
        hatch (and the bridge to ``classify_mibf`` when the filter DOES
        fit); defeats the store's point at target scale."""
        ids = np.zeros(self.m_slots, dtype=np.uint16)
        bounds = self.bounds
        for r in spark.read.parquet(f"{self.path}/segments").select("seg", "ids").collect():
            s = int(r["seg"])
            ids[bounds[s]: bounds[s + 1]] = np.frombuffer(bytes(r["ids"]), dtype=np.uint16)
        return MIBFSketch(
            self.m_slots, self.num_hashes, self.shingle_w, list(self.labels),
            ids, self.seeds, self.hash_family, self.canonical,
        )


def _delete_dir(spark: SparkSession, path: str) -> None:
    """Remove an intermediate directory through the Hadoop FileSystem API
    (works for any configured FS, not just file://)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def _stage_done(spark: SparkSession, path: str) -> bool:
    """A parquet stage counts as checkpointed only when its committer
    marker exists — a killed mid-write job leaves no ``_SUCCESS`` and the
    stage reruns from scratch (no partial-output resume)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def build_mibf_store(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    key_col: str = "lang",
    text_col: str = "text",
    shingle_w: int = 3,
    num_hashes: int = 3,
    occupancy: float = 0.5,
    seeds: list[str] | None = None,
    expected_entries: int | None = None,
    segment_bytes: int = 32 << 20,
    min_segments: int = 16,
    canonical: bool = False,
    hash_family: str = "poly",
    resume: bool = False,
    snapshot_id: str | None = None,
    pin_source: bool = True,
) -> MIBFStore:
    """Build a miBF straight into a parquet store (MIBFGen.hpp:131-309
    semantics; byte-identical resolution+saturation to ``build_mibf``).

    Segment count = enough that one segment's ids fit ``segment_bytes``
    (but at least ``min_segments`` for reducer parallelism), clamped by
    the same plan-size guard as the sharded passes.  The lifecycle:

    1. sizing pass (shared ``_prep_build``);
    2. ``_resolved_segments`` writes resolved uint16 slices to
       ``{path}/resolved`` — reducers write, driver sees nothing;
    3. ``_sharded_lost_slots`` scans for saturation one segment per pass
       (reading ``{path}/resolved`` from the driver only to broadcast);
    4. a cogrouped ``applyInPandas`` ORs SAT_BIT into the owned slots,
       emits per-segment label bincounts + saturation counts, and writes
       ``{path}/segments``; the tiny per-segment stats aggregate into
       ``{path}/meta``.

    ``resume=True`` makes each stage a checkpoint (the north rule's
    mid-build resumability, same contract as ``build_filters``): a killed
    job re-invoked with the same path restarts at the first stage whose
    ``_SUCCESS`` marker is missing.  Resume is only offered against the
    SAME input + parameters — a fingerprint of the scan's file listing
    (or ``snapshot_id`` for stable non-file identities, e.g. an Iceberg
    snapshot) and every sizing-relevant parameter is persisted at
    ``{path}/snapshot``; on mismatch the stale state is discarded and the
    build restarts from scratch.  The expensive stage (resolution — the
    corpus-wide claims shuffle) is never repeated once checkpointed; the
    per-segment rows double as the build's partition-level lineage.
    """
    snap_src = snapshot_id or ";".join(sorted(docs.inputFiles()))
    param_fp = repr((
        key_col, text_col, shingle_w, num_hashes, occupancy, seeds,
        expected_entries, segment_bytes, min_segments, canonical, hash_family,
    ))
    snap_fp = (
        hashlib.md5((snap_src + "|" + param_fp).encode()).hexdigest()
        if snap_src
        else None
    )
    snap_path = f"{path}/snapshot"
    resolved_path = f"{path}/resolved"
    seg_path = f"{path}/segments"
    meta_path = f"{path}/meta"

    state = "fresh"
    if resume and snap_fp is not None and _stage_done(spark, snap_path):
        old_fp = spark.read.parquet(snap_path).collect()[0]["fp"]
        if old_fp == snap_fp:
            if _stage_done(spark, meta_path):
                return load_mibf_store(spark, path)
            if _stage_done(spark, seg_path):
                state = "have_segments"
            elif _stage_done(spark, resolved_path):
                state = "have_resolved"
    if state == "fresh":
        for p in (snap_path, resolved_path, seg_path, meta_path):
            _delete_dir(spark, p)
        if snap_fp is not None:
            spark.createDataFrame([(snap_fp,)], "fp string").write.mode(
                "overwrite"
            ).parquet(snap_path)

    # deterministic re-derivation: same input + params => same labels,
    # m_slots, and segment bounds, so a resumed invocation recomputes the
    # cheap sizing pre-pass instead of persisting it
    base, bc_map, labels, seed_arr, h, canonical, m_slots = _prep_build(
        spark, docs, key_col, text_col, shingle_w, num_hashes, occupancy,
        seeds, expected_entries, canonical, hash_family,
    )
    L = len(labels)
    S = _clamp_segments(
        max(int(min_segments), -(-(2 * m_slots) // int(segment_bytes)))
    )
    bounds = _seg_bounds(m_slots, S)
    meta7 = (m_slots, h, shingle_w, labels, seed_arr, hash_family, canonical)

    if state != "have_segments":
        if state != "have_resolved":
            _resolved_segments(
                base, bc_map, m_slots, h, shingle_w, seed_arr, hash_family,
                canonical, bounds, S,
            ).write.mode("overwrite").parquet(resolved_path)

        # saturation: prefer the resolve stage's lost-pair sets (round 6)
        # — ONE corpus pass with a |collisions|-sized broadcast, or ZERO
        # passes when no claim lost its slot — over the segmented
        # full-array rescan (S corpus passes).  Falls back for resolved
        # checkpoints written before the `lost` column existed and for
        # lost sets too big to broadcast.
        resolved_cols = spark.read.parquet(resolved_path)
        sat_slots = None
        if "lost" in resolved_cols.columns:
            n_lost_bytes = int(
                resolved_cols.agg(
                    F.sum(F.length("lost")).alias("b")
                ).collect()[0]["b"]
                or 0
            )
            if n_lost_bytes == 0:
                sat_slots = spark.createDataFrame([], "slot long")
            elif n_lost_bytes <= _LOST_BROADCAST_CAP:
                lost_acc: dict[int, list[np.ndarray]] = {}
                for r in resolved_cols.select("lost").collect():
                    if r["lost"]:
                        ls, ll = _unpack_lost(bytes(r["lost"]))
                        for li in np.unique(ll):
                            lost_acc.setdefault(int(li), []).append(ls[ll == li])
                lost_by_label = {
                    li: np.unique(np.concatenate(parts))
                    for li, parts in lost_acc.items()
                }
                sat_slots = _lost_slots_from_pairs(
                    spark, base, meta7, bc_map, lost_by_label
                )
        if sat_slots is None:
            sat_slots = _sharded_lost_slots(
                spark, base, meta7,
                lambda s, lo, hi: _read_segment(spark, resolved_path, s, lo, hi),
                bc_map, bounds, pin_source=pin_source,
            )
        bounds_b = bounds  # captured by value semantics via closure

        def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                sl = pdf["slot"].to_numpy().astype(np.int64)
                seg = (np.searchsorted(bounds_b, sl, side="right") - 1).astype(np.int32)
                yield pd.DataFrame({"seg": seg, "slot": sl})

        sat_tagged = sat_slots.mapInPandas(
            tag, schema="seg int, slot long"
        )

        def finalize(key, seg_pdf: pd.DataFrame, sat_pdf: pd.DataFrame) -> pd.DataFrame:
            s = int(key[0])
            lo, hi = int(bounds_b[s]), int(bounds_b[s + 1])
            if len(seg_pdf):
                ids = np.frombuffer(bytes(seg_pdf["ids"].iloc[0]), dtype=np.uint16).copy()
            else:  # saturation slots always target owned (resolved) slots, but
                ids = np.zeros(hi - lo, dtype=np.uint16)  # stay total anyway
            if len(sat_pdf):
                ids[sat_pdf["slot"].to_numpy().astype(np.int64) - lo] |= SAT_BIT
            counts = np.bincount(
                (ids & ID_MASK).astype(np.int64), minlength=L + 1
            ).astype(np.int64)
            return pd.DataFrame(
                {
                    "seg": [s],
                    "ids": [ids.tobytes()],
                    "label_counts": [counts.tobytes()],
                    "sat_n": [int(((ids & SAT_BIT) != 0).sum())],
                }
            )

        resolved_df = spark.read.parquet(resolved_path)
        final = (
            resolved_df.groupby("seg")
            .cogroup(sat_tagged.groupby("seg"))
            .applyInPandas(finalize, schema=_FINAL_SEG_SCHEMA)
        )
        final.write.mode("overwrite").parquet(seg_path)
    # idempotent cleanup OUTSIDE the build branch: a kill between the
    # segments commit and this delete leaves an orphaned resolved/ dir
    # that the have_segments resume path would otherwise never reap
    _delete_dir(spark, resolved_path)

    # O(S) rows of O(L) stats — the only thing the driver aggregates
    stat_rows = (
        spark.read.parquet(seg_path)
        .select("label_counts", "sat_n")
        .collect()
    )
    label_counts = np.zeros(L + 1, dtype=np.int64)
    sat_total = 0
    for r in stat_rows:
        c = np.frombuffer(bytes(r["label_counts"]), dtype=np.int64)
        label_counts[: c.size] += c
        sat_total += int(r["sat_n"])
    # absent segments are all-empty: fold them into the empty-slot count
    label_counts[0] = m_slots - int(label_counts[1:].sum())

    seed_strs = None
    if seed_arr is not None:
        seed_strs = ["".join("1" if b else "0" for b in row) for row in seed_arr]
    spark.createDataFrame(
        [(m_slots, h, shingle_w, list(labels), seed_strs, hash_family,
          canonical, S, label_counts.tobytes(), sat_total)],
        _META_SCHEMA,
    ).write.mode("overwrite").parquet(meta_path)
    return MIBFStore(
        path, m_slots, h, shingle_w, list(labels), seed_arr, hash_family,
        canonical, S, label_counts, sat_total,
    )


def load_mibf_store(spark: SparkSession, path: str) -> MIBFStore:
    r = spark.read.parquet(f"{path}/meta").collect()[0].asDict()
    seeds = seed_masks_to_arrays(
        list(r["seeds"]) if r["seeds"] else None, int(r["shingle_w"])
    )
    return MIBFStore(
        path, int(r["m_slots"]), int(r["num_hashes"]), int(r["shingle_w"]),
        list(r["labels"]), seeds, str(r["hash_family"]), bool(r["canonical"]),
        int(r["n_segments"]),
        np.frombuffer(bytes(r["label_counts"]), dtype=np.int64).copy(),
        int(r["sat_slots"]),
    )


def classify_mibf_store(
    spark: SparkSession,
    docs: DataFrame,
    store: MIBFStore,
    alpha: float = 1e-10,
    multi_thresh: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    pin_source: bool = True,
) -> DataFrame:
    """``classify_mibf`` against a parquet store: always sharded, one
    segment broadcast per pass, ids fetched from disk — executor AND
    driver memory bounded by one segment (MIBFClassifier.hpp:773-939
    semantics, identical outputs to the in-memory path).

    ``pin_source=False``: re-scan instead of pinning the projected corpus
    between segment passes — only for deterministic sources (see
    ``session.pin_rows``)."""
    return _classify_mibf_sharded(
        spark, docs, store.meta, store.seg_fetch(spark), store.n_segments,
        store.per_frame_prob(), alpha / max(1, len(store.labels)),
        multi_thresh, id_col, [text_col], pin_source=pin_source,
    )


def classify_mibf_store_pairs(
    spark: SparkSession,
    docs: DataFrame,
    store: MIBFStore,
    alpha: float = 1e-10,
    multi_thresh: int = 2,
    id_col: str = "doc_id",
    text1_col: str = "text1",
    text2_col: str = "text2",
    pin_source: bool = True,
) -> DataFrame:
    """Paired (-e) classification against a parquet store — counts sum
    across mates before the combined-frame binomial test
    (MIBFClassifier.hpp:753-835), same as ``classify_mibf_pairs``."""
    return _classify_mibf_sharded(
        spark, docs, store.meta, store.seg_fetch(spark), store.n_segments,
        store.per_frame_prob(), alpha / max(1, len(store.labels)),
        multi_thresh, id_col, [text1_col, text2_col], pin_source=pin_source,
    )
