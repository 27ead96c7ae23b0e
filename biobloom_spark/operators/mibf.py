"""miBF build + classify — BioBloomMIMaker / BioBloomMICategorizer,
Spark-native (the multi-index product line: SURVEY.md §2 A7/A8/T2/M-miBF).

Reference lifecycle:
- maker (/root/reference/BioBloomMaker/MIBFGen.hpp:131-309 via
  BioBloomMIMaker.cpp): 3 passes — occupied-bit vector, ID insertion with
  fair-random collision ownership, saturation marking for elements that
  lost every slot.
- classifier (/root/reference/BioBloomCategorizer/MIBFClassifier.hpp:
  773-939): per-read per-ID frame counts (distinct per frame), "full"
  counts restricted to all-probes-present non-saturated frames, binomial
  significance with Bonferroni correction ``alpha / numIDs``
  (MIBFClassifier.hpp:895,936), ranking by (full count desc, p-value asc)
  and the ``-m`` multi-match window: a secondary hit within
  ``multi_thresh`` full-count of the best makes the read multiMatch
  (Doc/MultiIndex.md §5 "Do you output multimapping sequences?";
  default -m 2, MIBFClassifier options).

Spark shape mirrors the plain-Bloom jobs: the claims pass is mapInPandas
over the corpus partitions (zero shuffle — only sparse claim blobs move),
ownership resolves by an associative min-tiebreak merge in one reducer
per slot-range segment (the driver only memcpy-assembles resolved uint16
slices — claim-cardinality data never lands on the driver), saturation is
a second broadcast pass with per-segment dedup, and classification is one
broadcast + mapInPandas pass over the (much larger) query corpus.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import MULTI_MATCH, NO_MATCH
from ..functions.stats import log_binom_sf
from ..functions.text import batch_doc_shingles, batch_frames
from ..sketch.mibf import (
    ID_MASK,
    MAX_LABELS,
    MIBFClaims,
    MIBFSketch,
    SAT_BIT,
    flat_seed_hashes,
    mibf_size_slots,
    seed_masks_to_arrays,
)

__all__ = [
    "build_mibf", "classify_mibf", "classify_mibf_pairs", "mibf_summarize",
    "save_mibf", "load_mibf",
]

_CLAIMS_SCHEMA = T.StructType(
    [
        T.StructField("seg", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

_SEG_IDS_SCHEMA = T.StructType(
    [
        T.StructField("seg", T.IntegerType(), False),
        T.StructField("ids", T.BinaryType(), False),
        # lost (slot, label) claim pairs of this segment — int64 slots
        # followed by uint16 labels (n = len/10).  The saturation pass
        # needs ONLY these (see MIBFClaims.lost_pairs), so the dense
        # build can broadcast ~|collisions| bytes instead of the full
        # uint16 id array.
        T.StructField("lost", T.BinaryType(), True),
    ]
)


def _pack_lost(slots: np.ndarray, labels: np.ndarray) -> bytes:
    return slots.astype("<i8").tobytes() + labels.astype("<u2").tobytes()


def _unpack_lost(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    n = len(payload) // 10
    return (
        np.frombuffer(payload[: 8 * n], dtype="<i8").astype(np.int64),
        np.frombuffer(payload[8 * n :], dtype="<u2").astype(np.uint16),
    )

_SAT_SCHEMA = T.StructType(
    [
        T.StructField("seg", T.IntegerType(), False),
        T.StructField("slots", T.BinaryType(), False),
    ]
)


_MAX_SHARD_SEGMENTS = 128


def _clamp_segments(n_seg: int) -> int:
    """Plan-size guard for the sharded passes: each slot-range segment is
    its own mapInPandas leg in one union, so a degenerate
    ``max_broadcast_bytes`` (e.g. 1) must not turn into a 100k-leg plan
    that stalls Catalyst analysis.  128 passes x a rehash of the corpus is
    already past the point where a larger per-pass budget is the right
    call; beyond the clamp the per-pass broadcast simply exceeds the cap
    (documented trade, never wrong results).
    """
    return max(1, min(int(n_seg), _MAX_SHARD_SEGMENTS))


def _seg_bounds(m_slots: int, n_segments: int) -> np.ndarray:
    """Slot-range segment boundaries: int64[n_segments+1], segment s spans
    ``[bounds[s], bounds[s+1])``.  Proportional split — claim slots are
    uniform over [0, m) so segments load-balance."""
    return (np.arange(n_segments + 1, dtype=np.int64) * m_slots) // n_segments


def _resolved_segments(
    base: DataFrame,
    bc_map,
    m_slots: int,
    h: int,
    shingle_w: int,
    seed_arr: np.ndarray | None,
    hash_family: str,
    canonical: bool,
    bounds: np.ndarray,
    S: int,
) -> DataFrame:
    """Claims map pass + one ownership reducer per slot-range segment →
    DataFrame (seg, ids): the resolved uint16 id slices (MIBFGen.hpp
    passes 1-2, distributed).  Shared by ``build_mibf`` (which collects
    the S slices and memcpy-assembles) and ``build_mibf_store`` (which
    writes them straight to parquet — no driver assembly at all).
    Segments with zero claims emit no row (an absent row = all-empty
    slice)."""

    def claims_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lmap = bc_map.value
        cache: dict = {}
        parts: list[MIBFClaims] = []
        probe = MIBFSketch(
            m_slots, h, shingle_w, [], np.zeros(0, dtype=np.uint16), seed_arr,
            hash_family, canonical,
        )
        for pdf in batches:
            for lab, grp in pdf.groupby("__label"):
                li = lmap.get(str(lab))
                if li is None:
                    continue
                rows, _off = _frame_hash_rows(
                    grp["__text"].to_numpy(), None, shingle_w, seed_arr, cache,
                    canonical, hash_family,
                )
                if rows.size == 0:
                    continue
                pos = probe.positions_for(rows)
                parts.append(MIBFClaims.from_positions(pos, li))
        acc = MIBFClaims.merge_all(parts)  # ONE sort per partition
        if acc.slots.size == 0:
            return
        # slots are sorted: one searchsorted splits the partial by segment
        cut = np.searchsorted(acc.slots, bounds)
        out_seg, out_pl = [], []
        for s in range(S):
            lo, hi = int(cut[s]), int(cut[s + 1])
            if hi > lo:
                out_seg.append(s)
                out_pl.append(MIBFClaims(acc.slots[lo:hi], acc.ties[lo:hi]).serialize())
        yield pd.DataFrame({"seg": out_seg, "payload": out_pl})

    partials = base.mapInPandas(claims_pass, schema=_CLAIMS_SCHEMA)

    def resolve_seg(key, pdf: pd.DataFrame) -> pd.DataFrame:
        """One reducer per slot-range segment: merge that segment's claims
        (associative min-tiebreak) and emit the resolved uint16 id slice
        plus the segment's lost (slot, label) claim pairs."""
        s = int(key[0])
        acc = MIBFClaims.merge_all(
            [MIBFClaims.deserialize(bytes(p)) for p in pdf["payload"]]
        )  # ONE sort per segment, not a 64-step merge chain
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        win = acc.winners()
        ids_seg = np.zeros(hi - lo, dtype=np.uint16)
        ids_seg[win.slots - lo] = win.owners()
        lost_slots, lost_labels = acc.lost_pairs()
        return pd.DataFrame(
            {
                "seg": [s],
                "ids": [ids_seg.tobytes()],
                "lost": [_pack_lost(lost_slots, lost_labels)],
            }
        )

    return partials.groupBy("seg").applyInPandas(resolve_seg, schema=_SEG_IDS_SCHEMA)


def _frame_hash_rows(
    texts, labels_idx, w: int, seeds, cache: dict,
    canonical: bool = False, hash_family: str = "poly",
):
    """Per label group → (hash rows, offsets).  k-mer mode: (1D hashes,
    offsets — poly, canonical-poly, or NTC64 per ``hash_family``); seed
    mode: ((h, n) rows, offsets)."""
    if seeds is None:
        frames, offsets, _th, _tc = batch_frames(
            texts, w, cache, canonical=canonical, hash_family=hash_family
        )
        return frames, offsets
    _fr, _off, tok_hashes, tok_counts = batch_doc_shingles(texts, w, cache)
    rows, offsets2 = flat_seed_hashes(tok_hashes, tok_counts, w, seeds)
    return rows, offsets2


def _prep_build(
    spark: SparkSession,
    docs: DataFrame,
    key_col: str,
    text_col: str,
    shingle_w: int,
    num_hashes: int,
    occupancy: float,
    seeds: list[str] | None,
    expected_entries: int | None,
    canonical: bool,
    hash_family: str,
):
    """Shared build prologue (validation, label map, sizing pass) for
    ``build_mibf`` and ``mibf_store.build_mibf_store``.  Returns
    ``(base, bc_map, labels, seed_arr, h, canonical, m_slots)`` where
    ``base`` is the (__label, __text) projection of the corpus."""
    from ..session import ensure_workers

    ensure_workers(spark)
    seed_arr = seed_masks_to_arrays(seeds, shingle_w)
    if seed_arr is not None and (hash_family != "poly" or canonical):
        raise ValueError("spaced-seed miBF mode is poly-family only")
    if hash_family == "nthash" and canonical:
        canonical = False  # NTC64 is canonical by construction
    h = seed_arr.shape[0] if seed_arr is not None else num_hashes

    docs = docs.filter(F.col(key_col).isNotNull() & F.col(text_col).isNotNull())
    # ONE prologue job: labels + frames upper bound per label from a single
    # groupBy — the old shape (distinct collect + a second sum agg) paid
    # two full metadata scans (guide §2.4: fewer passes)
    from .maker import frames_upper_bound_col

    frames_ub = frames_upper_bound_col(text_col, shingle_w)
    key_rows = (
        docs.groupBy(key_col).agg(F.sum(frames_ub).alias("__f")).collect()
    )
    labels = sorted(str(r[0]) for r in key_rows)
    label_to_idx = {lab: i + 1 for i, lab in enumerate(labels)}

    if expected_entries is None:
        expected_entries = int(sum(r["__f"] or 0 for r in key_rows) or 1)
    m_slots = mibf_size_slots(expected_entries, h, occupancy)

    if len(labels) > MAX_LABELS:
        raise ValueError(f"miBF supports at most {MAX_LABELS} labels")
    bc_map = spark.sparkContext.broadcast(label_to_idx)
    base = docs.select(
        F.col(key_col).cast("string").alias("__label"), F.col(text_col).alias("__text")
    )
    return base, bc_map, labels, seed_arr, h, canonical, m_slots


def build_mibf(
    spark: SparkSession,
    docs: DataFrame,
    key_col: str = "lang",
    text_col: str = "text",
    shingle_w: int = 3,
    num_hashes: int = 3,
    occupancy: float = 0.5,
    seeds: list[str] | None = None,
    expected_entries: int | None = None,
    merge_segments: int | None = None,
    max_broadcast_bytes: int | None = None,
    canonical: bool = False,
    hash_family: str = "poly",
    pin_source: bool = True,
) -> MIBFSketch:
    """Build one miBF over all values of ``key_col`` (labels).

    ``hash_family``/``canonical`` select the frame hasher (k-mer mode
    only; the reference miBF hashes through canonical ntHash —
    MIBFGen.hpp's ntHashIterator): "poly" = token shingles,
    optionally strand-canonical; "nthash" = published NTC64 base k-mers
    over the de-spaced text with NTM64 probe positions (canonical by
    construction).  Spaced-seed mode is poly-only.

    Passes (MIBFGen.hpp:131-309 analog):
    1. sizing: frames upper bound → slots for the target occupancy
       (``-b``, default 0.5) — the reference's ``-n``/file-size estimate;
    2. claims: every (label, frame) claims its h probe slots with a
       deterministic pseudo-random tiebreak; map tasks split their sparse
       claim sets by slot range into ``merge_segments`` segments and one
       reducer per segment resolves ownership to a uint16 id slice — the
       driver only memcpy-assembles slices (never touches claim blobs),
       mirroring the Bloom build's segmented merge (maker._assemble_fn);
    3. saturation: frames whose label lost every slot mark those slots
       saturated (insertSaturation analog) — lost-slot sets are likewise
       deduped per segment in reducers before the driver ORs the bit.
    The corpus is read twice and never shuffled; only sparse claim blobs
    move, and no claim-cardinality data structure ever lands on the
    driver.  Labels are capped at 32767 (Doc/MultiIndex.md:165).

    ``max_broadcast_bytes`` caps the id-array bytes broadcast during the
    saturation pass: beyond the cap, saturation runs sharded by slot-range
    segment (one segment broadcast per pass, per-probe ownership entries
    stitched by a frame-level OR — ``_saturate_sharded``) instead of
    broadcasting the full resolved sketch.  None = single broadcast.

    ``pin_source`` (sharded saturation only): pin the projected corpus
    once for the segment passes; set False only for sources that
    re-evaluate deterministically (see ``session.pin_rows``).
    """
    base, bc_map, labels, seed_arr, h, canonical, m_slots = _prep_build(
        spark, docs, key_col, text_col, shingle_w, num_hashes, occupancy,
        seeds, expected_entries, canonical, hash_family,
    )
    if merge_segments is None:
        # scale-adaptive: one ownership reducer per available task slot
        # (resolved ids are segment-count-invariant — pinned by
        # test_segmented_resolution_matches_local_twin); the fixed 16 left
        # half the cores idle through the resolve stage on local[32] and
        # under-parallelises any larger cluster
        merge_segments = _clamp_segments(
            max(16, spark.sparkContext.defaultParallelism)
        )
    S = max(1, int(merge_segments))
    bounds = _seg_bounds(m_slots, S)

    resolved = _resolved_segments(
        base, bc_map, m_slots, h, shingle_w, seed_arr, hash_family, canonical,
        bounds, S,
    )
    ids = np.zeros(m_slots, dtype=np.uint16)
    lost_acc: dict[int, list[np.ndarray]] = {}
    n_lost = 0
    # toPandas: the resolved slices are ~2 B x m_slots of binary — the
    # Arrow transfer path measured 2x faster than the pickled-row collect
    # for this payload (tools/r06_measure notes; guide §6 Arrow transfers)
    for r in resolved.toPandas().itertuples(index=False):
        s = int(r.seg)
        ids[bounds[s] : bounds[s + 1]] = np.frombuffer(bytes(r.ids), dtype=np.uint16)
        if r.lost:
            lslots, llabels = _unpack_lost(bytes(r.lost))
            n_lost += lslots.size
            for li in np.unique(llabels):
                lost_acc.setdefault(int(li), []).append(lslots[llabels == li])
    sketch = MIBFSketch(
        m_slots, h, shingle_w, labels, ids, seed_arr, hash_family, canonical
    )

    # --- saturation pass (insertSaturation, MIBFGen.hpp:196-223) ----------
    # An element is saturated iff its label lost EVERY probe slot, and a
    # probed slot is always claimed — so losing a slot == appearing in the
    # resolve stage's lost-pair set.  When that set is small (it is
    # |collision claims|, not |slots|), broadcast it instead of the full
    # uint16 id array: the per-worker broadcast read drops from
    # O(m_slots) to O(collisions) and a collision-free corpus (disjoint
    # label vocabularies) skips the second corpus scan entirely.
    if n_lost == 0:
        return sketch
    lost_by_label = {
        li: np.unique(np.concatenate(parts)) for li, parts in lost_acc.items()
    }
    lost_bytes = 10 * n_lost
    if lost_bytes <= max(sketch.ids.nbytes // 2, 1 << 20) and (
        max_broadcast_bytes is None or lost_bytes <= max_broadcast_bytes
    ):
        _saturate_lost_pairs(
            spark, base, sketch, bc_map, lost_by_label, bounds, S,
            seed_arr, hash_family, canonical,
        )
        return sketch
    if max_broadcast_bytes is not None and sketch.ids.nbytes > max_broadcast_bytes:
        n_seg = _clamp_segments(-(-sketch.ids.nbytes // max_broadcast_bytes))
        _saturate_sharded(spark, base, sketch, bc_map, n_seg, pin_source=pin_source)
        return sketch
    bc_ids = spark.sparkContext.broadcast(sketch.serialize())

    def sat_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lmap = bc_map.value
        resolved = MIBFSketch.deserialize(
            bc_ids.value, m_slots, h, shingle_w, labels, seed_arr,
            hash_family=hash_family, canonical=canonical,
        )
        cache: dict = {}
        sat: list[np.ndarray] = []
        for pdf in batches:
            for lab, grp in pdf.groupby("__label"):
                li = lmap.get(str(lab))
                if li is None:
                    continue
                rows, _off = _frame_hash_rows(
                    grp["__text"].to_numpy(), None, shingle_w, seed_arr, cache,
                    canonical, hash_family,
                )
                if rows.size == 0:
                    continue
                pos = resolved.positions_for(rows)
                lost = resolved.lost_elements(pos, li)
                if lost.any():
                    sat.append(np.unique(pos[:, lost]))
        if sat:
            allsat = np.unique(np.concatenate(sat))
            cut = np.searchsorted(allsat, bounds)
            out_seg, out_sl = [], []
            for s in range(S):
                lo, hi = int(cut[s]), int(cut[s + 1])
                if hi > lo:
                    out_seg.append(s)
                    out_sl.append(allsat[lo:hi].tobytes())
            yield pd.DataFrame({"seg": out_seg, "slots": out_sl})

    def sat_reduce(key, pdf: pd.DataFrame) -> pd.DataFrame:
        """Dedup one segment's lost slots before they reach the driver."""
        u = np.unique(
            np.concatenate(
                [np.frombuffer(bytes(p), dtype=np.int64) for p in pdf["slots"]]
            )
        )
        return pd.DataFrame({"seg": [int(key[0])], "slots": [u.tobytes()]})

    for r in (
        base.mapInPandas(sat_pass, schema=_SAT_SCHEMA)
        .groupBy("seg")
        .applyInPandas(sat_reduce, schema=_SAT_SCHEMA)
        .collect()
    ):
        sketch.apply_saturation(np.frombuffer(bytes(r["slots"]), dtype=np.int64))
    return sketch


def _saturate_lost_pairs(
    spark: SparkSession,
    base: DataFrame,
    sketch: MIBFSketch,
    bc_map,
    lost_by_label: dict[int, np.ndarray],
    bounds: np.ndarray,
    S: int,
    seed_arr: np.ndarray | None,
    hash_family: str,
    canonical: bool,
) -> None:
    """Saturation from the resolve stage's lost-pair sets — the id-array-
    free twin of ``build_mibf``'s dense ``sat_pass``.

    ``lost_by_label[li]`` = sorted slots label ``li`` claimed but lost.
    A frame of label ``li`` is saturated iff ALL its probe slots are in
    that set (every probed slot was claimed by the label in pass 1, so
    'not owned' == 'lost'); label groups with an empty lost set skip the
    membership test — only the rehash remains, and the pass is launched
    at all only when some label lost something.
    """
    m_slots, h, shingle_w = sketch.m_slots, sketch.num_hashes, sketch.shingle_w
    bc_lost = spark.sparkContext.broadcast(lost_by_label)
    probe = MIBFSketch(
        m_slots, h, shingle_w, [], np.zeros(0, dtype=np.uint16), seed_arr,
        hash_family, canonical,
    )

    def sat_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lmap = bc_map.value
        lostmap = bc_lost.value
        cache: dict = {}
        sat: list[np.ndarray] = []
        for pdf in batches:
            for lab, grp in pdf.groupby("__label"):
                li = lmap.get(str(lab))
                if li is None:
                    continue
                lost_L = lostmap.get(int(li))
                if lost_L is None or lost_L.size == 0:
                    continue
                rows, _off = _frame_hash_rows(
                    grp["__text"].to_numpy(), None, shingle_w, seed_arr, cache,
                    canonical, hash_family,
                )
                if rows.size == 0:
                    continue
                pos = probe.positions_for(rows)
                idx = np.searchsorted(lost_L, pos)
                np.minimum(idx, lost_L.size - 1, out=idx)
                member = lost_L[idx] == pos
                lost = member.all(axis=0)
                if lost.any():
                    sat.append(np.unique(pos[:, lost]))
        if sat:
            allsat = np.unique(np.concatenate(sat))
            cut = np.searchsorted(allsat, bounds)
            out_seg, out_sl = [], []
            for s in range(S):
                lo, hi = int(cut[s]), int(cut[s + 1])
                if hi > lo:
                    out_seg.append(s)
                    out_sl.append(allsat[lo:hi].tobytes())
            yield pd.DataFrame({"seg": out_seg, "slots": out_sl})

    def sat_reduce(key, pdf: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(
            np.concatenate(
                [np.frombuffer(bytes(p), dtype=np.int64) for p in pdf["slots"]]
            )
        )
        return pd.DataFrame({"seg": [int(key[0])], "slots": [u.tobytes()]})

    for r in (
        base.mapInPandas(sat_pass, schema=_SAT_SCHEMA)
        .groupBy("seg")
        .applyInPandas(sat_reduce, schema=_SAT_SCHEMA)
        .collect()
    ):
        sketch.apply_saturation(np.frombuffer(bytes(r["slots"]), dtype=np.int64))


def _lost_slots_from_pairs(
    spark: SparkSession,
    base: DataFrame,
    meta: tuple,
    bc_map,
    lost_by_label: dict[int, np.ndarray],
) -> DataFrame:
    """Distributed lost-element scan from the resolve stage's lost-pair
    sets: ONE corpus pass, no id-array broadcast — the store-build twin
    of ``_saturate_lost_pairs`` (returns the same distinct ``slot``
    DataFrame shape as ``_sharded_lost_slots``)."""
    m_slots, h, w, _labels, seeds, family, canonical = meta
    bc_lost = spark.sparkContext.broadcast(lost_by_label)
    probe = MIBFSketch(
        m_slots, h, w, [], np.zeros(0, dtype=np.uint16), seeds, family, canonical
    )
    slot_schema = T.StructType([T.StructField("slot", T.LongType(), False)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lmap = bc_map.value
        lostmap = bc_lost.value
        cache: dict = {}
        sat: list[np.ndarray] = []
        for pdf in batches:
            for lab, grp in pdf.groupby("__label"):
                li = lmap.get(str(lab))
                if li is None:
                    continue
                lost_L = lostmap.get(int(li))
                if lost_L is None or lost_L.size == 0:
                    continue
                rows, _off = _frame_hash_rows(
                    grp["__text"].to_numpy(), None, w, seeds, cache,
                    canonical, family,
                )
                if rows.size == 0:
                    continue
                pos = probe.positions_for(rows)
                idx = np.searchsorted(lost_L, pos)
                np.minimum(idx, lost_L.size - 1, out=idx)
                member = lost_L[idx] == pos
                lost = member.all(axis=0)
                if lost.any():
                    sat.append(np.unique(pos[:, lost]))
        if sat:
            yield pd.DataFrame({"slot": np.unique(np.concatenate(sat))})

    return base.mapInPandas(run, schema=slot_schema).distinct()


def _saturate_sharded(
    spark: SparkSession,
    base: DataFrame,
    sketch: MIBFSketch,
    bc_map,
    n_segments: int,
    pin_source: bool = True,
) -> None:
    """Saturation without a full-array broadcast — the sharded twin of the
    ``sat_pass`` in ``build_mibf`` (insertSaturation, MIBFGen.hpp:196-223).
    Mutates ``sketch`` in place (sets SAT_BIT), like the dense pass.
    """
    bounds = _seg_bounds(sketch.m_slots, int(n_segments))
    ids = sketch.ids
    sat_slots = _sharded_lost_slots(
        spark, base, _sketch_meta(sketch),
        lambda s, lo, hi: ids[lo:hi].tobytes(), bc_map, bounds,
        pin_source=pin_source,
    )
    pack_schema = T.StructType([T.StructField("slots", T.BinaryType(), False)])

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame(
                    {"slots": [pdf["slot"].to_numpy().astype(np.int64).tobytes()]}
                )

    for r in sat_slots.mapInPandas(pack, schema=pack_schema).collect():
        sketch.apply_saturation(np.frombuffer(bytes(r["slots"]), dtype=np.int64))


def _sharded_lost_slots(
    spark: SparkSession,
    base: DataFrame,
    meta: tuple,
    seg_bytes,
    bc_map,
    bounds: np.ndarray,
    pin_source: bool = True,
) -> DataFrame:
    """The distributed lost-element scan shared by the in-memory sharded
    saturation and the store build (insertSaturation, MIBFGen.hpp:196-223).

    Pass s broadcasts only slot range ``[bounds[s], bounds[s+1])`` of the
    resolved id array (``seg_bytes(s, lo, hi)`` — an in-memory slice or a
    parquet segment read) and emits, for every probe position it owns, one
    (row, frame, slot, owned-by-this-label) entry.  Every probe belongs to
    exactly one segment, so a groupBy on (row, frame) sees all h probes of
    every frame: frames where no probe is owned are the lost elements, and
    their slots — deduped distributively — are the saturation set.  The
    corpus is hashed once per segment and the probe entries ride one
    shuffle; executor memory stays bounded by the segment size.  Returns a
    DataFrame with one distinct ``slot`` column.
    """
    m_slots, h, w, _labels, seeds, family, canonical = meta
    S = len(bounds) - 1
    from ..session import pin_rows

    # pin: saturation bits must come from ONE consistent row set across
    # the S passes even for non-deterministic sources (see session.pin_rows;
    # pin_source=False = caller asserts a deterministic source, re-scan)
    keyed = pin_rows(
        base.withColumn("__row", F.monotonically_increasing_id()),
        pin=pin_source,
    )
    entry_schema = T.StructType(
        [
            T.StructField("__row", T.LongType(), False),
            T.StructField("frame", T.LongType(), False),
            T.StructField("slot", T.LongType(), False),
            T.StructField("owned", T.BooleanType(), False),
        ]
    )

    def seg_pass(s: int):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        bc_seg = spark.sparkContext.broadcast(seg_bytes(s, lo, hi))

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # must not close over `sketch` (would ship the full id array)
            seg = np.frombuffer(bc_seg.value, dtype=np.uint16)
            probe = MIBFSketch(
                m_slots, h, w, [], np.zeros(0, dtype=np.uint16), seeds,
                family, canonical,
            )
            lmap = bc_map.value
            cache: dict = {}
            for pdf in batches:
                cols: list[list[np.ndarray]] = [[], [], [], []]
                for lab, grp in pdf.groupby("__label"):
                    li = lmap.get(str(lab))
                    if li is None:
                        continue
                    rows_h, offsets = _frame_hash_rows(
                        grp["__text"].to_numpy(), None, w, seeds, cache,
                        canonical, family,
                    )
                    if rows_h.size == 0 or int(offsets[-1]) == 0:
                        continue
                    pos = probe.positions_for(rows_h)
                    in_seg = (pos >= lo) & (pos < hi)
                    ii, gg = np.nonzero(in_seg)
                    if ii.size == 0:
                        continue
                    doc = np.searchsorted(offsets, gg, side="right") - 1
                    slots = pos[ii, gg]
                    row_ids = grp["__row"].to_numpy()
                    cols[0].append(row_ids[doc])
                    cols[1].append(gg - offsets[doc])
                    cols[2].append(slots)
                    cols[3].append(
                        (seg[slots - lo] & ID_MASK) == np.uint16(li)
                    )
                if cols[0]:
                    yield pd.DataFrame(
                        {
                            "__row": np.concatenate(cols[0]),
                            "frame": np.concatenate(cols[1]),
                            "slot": np.concatenate(cols[2]),
                            "owned": np.concatenate(cols[3]),
                        }
                    )

        return keyed.mapInPandas(run, schema=entry_schema)

    entries = seg_pass(0)
    for s in range(1, S):
        entries = entries.unionByName(seg_pass(s))
    lost = (
        entries.groupBy("__row", "frame")
        .agg(
            F.max(F.col("owned").cast("int")).alias("any_owned"),
            F.collect_list("slot").alias("slots"),
        )
        .filter(F.col("any_owned") == 0)
    )
    return lost.select(F.explode("slots").alias("slot")).distinct()


def _sketch_meta(sketch: MIBFSketch) -> tuple:
    """(m_slots, h, w, labels, seeds, hash_family, canonical) — the
    id-array-free description the sharded kernels close over."""
    return (
        sketch.m_slots, sketch.num_hashes, sketch.shingle_w, sketch.labels,
        sketch.seeds, sketch.hash_family, sketch.canonical,
    )


def _count_batch(texts: np.ndarray, sketch: MIBFSketch, cache: dict):
    """Per-doc per-label hit counting (evalRead counts loop,
    MIBFClassifier.hpp:850-890) over one batch.

    Returns (frames[n_docs], keys, counts, full) where ``keys`` encodes
    (doc, label) as doc*(L+1)+label, ``counts`` is the distinct-per-frame
    any-probe count and ``full`` the all-probes-present non-saturated
    count.  Mergeable across mates: concatenate keys and sum (the paired
    classify sums both reads' counts against the combined frame count —
    MIBFClassifier.hpp:802-835 ``classify(support, seq1, seq2)``).
    """
    w, L = sketch.shingle_w, len(sketch.labels)
    rows, offsets = _frame_hash_rows(
        texts, None, w, sketch.seeds, cache, sketch.canonical, sketch.hash_family
    )
    frames = np.diff(offsets)
    if int(offsets[-1]) == 0:
        empty = np.empty(0, dtype=np.int64)
        return frames, empty, empty, empty
    pos = sketch.positions_for(rows)  # (h, n_fr)
    lab, sat = sketch.gather(pos)  # (h, n_fr) uint16 / bool
    keys, counts, full = _count_from_gather(offsets, lab, sat, L)
    return frames, keys, counts, full


def _count_from_gather(offsets: np.ndarray, lab: np.ndarray, sat: np.ndarray, L: int):
    """The counting core of ``_count_batch`` given pre-gathered per-probe
    (label, saturated) matrices — also the stitch kernel of the sharded
    classify path, where the (h, n_frames) matrices are reassembled from
    per-segment passes instead of a full-array gather.

    Returns (keys, counts, full) in the ``_count_batch`` encoding.
    """
    n_fr = int(offsets[-1])
    empty = np.empty(0, dtype=np.int64)
    if n_fr == 0:
        return empty, empty, empty
    h = lab.shape[0]
    frame_col = np.tile(np.arange(n_fr, dtype=np.int64), h)
    lab_flat = lab.ravel().astype(np.int64)
    sat_flat = sat.ravel()
    doc_of_frame = np.searchsorted(offsets, np.arange(n_fr), side="right") - 1

    def per_doc_label_counts(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """distinct-per-frame (doc, label) counts over probe entries where
        ``mask`` holds → (doc*(L+1)+label keys, counts)."""
        sel = mask & (lab_flat > 0)
        if not sel.any():
            return empty, empty
        fl_keys = frame_col[sel] * np.int64(L + 1) + lab_flat[sel]
        fl_uniq = np.unique(fl_keys)  # one per (frame, label)
        fr = fl_uniq // np.int64(L + 1)
        lb = fl_uniq % np.int64(L + 1)
        dl_keys = doc_of_frame[fr] * np.int64(L + 1) + lb
        return np.unique(dl_keys, return_counts=True)

    keys_c, counts_c = per_doc_label_counts(np.ones_like(sat_flat, dtype=bool))
    if keys_c.size == 0:
        return empty, empty, empty
    full_frame = (lab > 0).all(axis=0)
    keys_f, counts_f = per_doc_label_counts(full_frame[frame_col] & ~sat_flat)
    full_i = np.zeros(keys_c.size, dtype=np.int64)
    if keys_f.size:
        fidx = np.searchsorted(keys_f, keys_c)
        fidx = np.clip(fidx, 0, keys_f.size - 1)
        match = keys_f[fidx] == keys_c
        full_i[match] = counts_f[fidx[match]]
    return keys_c, counts_c, full_i


def _merge_counts(parts: list[tuple]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sum keyed (doc,label) count sets from several mates."""
    keys = np.concatenate([p[0] for p in parts])
    if keys.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    counts = np.concatenate([p[1] for p in parts])
    full = np.concatenate([p[2] for p in parts])
    uniq, inv = np.unique(keys, return_inverse=True)
    return (
        uniq,
        np.bincount(inv, weights=counts).astype(np.int64),
        np.bincount(inv, weights=full).astype(np.int64),
    )


def _decide_batch(
    n_docs: int,
    frames: np.ndarray,
    keys_c: np.ndarray,
    counts_c: np.ndarray,
    full_i: np.ndarray,
    sketch: MIBFSketch,
    per_frame_prob: np.ndarray,
    alpha_adj: float,
    multi_thresh: int,
):
    """Significance + ranking (MIBFClassifier.hpp:842-930) given counts.

    Returns (assigned, hits_lists, best_scores)."""
    L = len(sketch.labels)
    assigned = np.full(n_docs, NO_MATCH, dtype=object)
    hits_out: list = [[] for _ in range(n_docs)]
    best = np.zeros(n_docs)
    if keys_c.size == 0:
        return assigned, hits_out, best
    doc_i = keys_c // np.int64(L + 1)
    lab_i = keys_c % np.int64(L + 1)

    # binomial significance P(X > count) < alpha/numIDs (Bonferroni,
    # MIBFClassifier.hpp:895,936); memoize per unique (count, frames, label)
    n_doc_frames = frames[doc_i]
    trip = np.stack([counts_c, n_doc_frames, lab_i], axis=1)
    uniq, inv = np.unique(trip, axis=0, return_inverse=True)
    logp_u = np.empty(uniq.shape[0])
    for k, (c, n, li) in enumerate(uniq):
        logp_u[k] = log_binom_sf(int(c) + 1, int(n), float(per_frame_prob[int(li)]))
    logp = logp_u[inv]
    signif = logp < math.log(alpha_adj) if alpha_adj > 0 else np.zeros_like(logp, dtype=bool)

    d, li, cn, fu, lp = doc_i[signif], lab_i[signif], counts_c[signif], full_i[signif], logp[signif]
    if d.size:
        # rank per doc: full count desc, p-value asc (MIBFClassifier.hpp:903-909)
        order = np.lexsort((lp, -fu, d))
        d, li, cn, fu, lp = d[order], li[order], cn[order], fu[order], lp[order]
        first = np.empty(d.size, dtype=bool)
        first[0] = True
        first[1:] = d[1:] != d[:-1]
        best_fu = fu[np.maximum.accumulate(np.where(first, np.arange(d.size), 0))]
        # -m window: keep secondaries within multi_thresh of the best full
        # count (Doc/MultiIndex.md §5; default 2); the best row always stays
        keep = first | (fu + multi_thresh > best_fu)
        d2, li2, lp2, first2 = d[keep], li[keep], lp[keep], first[keep]
        labels_np = np.asarray(["?"] + sketch.labels, dtype=object)
        bounds = np.flatnonzero(np.concatenate([first2[1:], [True]])) + 1
        starts = np.concatenate([[0], bounds[:-1]])
        for s, e in zip(starts, bounds):
            doc = int(d2[s])
            hits_out[doc] = list(labels_np[li2[s:e]])
            assigned[doc] = hits_out[doc][0] if e - s == 1 else MULTI_MATCH
            best[doc] = min(1000.0, -10.0 * lp2[s] / math.log(10.0))
    return assigned, hits_out, best


def _classify_batch(
    texts: np.ndarray,
    sketch: MIBFSketch,
    per_frame_prob: np.ndarray,
    alpha_adj: float,
    multi_thresh: int,
    cache: dict,
):
    """Vectorized single-read evalRead over one batch: count + decide.

    Returns (n_frames, assigned, hits_lists, best_scores)."""
    frames, keys_c, counts_c, full_i = _count_batch(texts, sketch, cache)
    assigned, hits_out, best = _decide_batch(
        frames.size, frames, keys_c, counts_c, full_i, sketch,
        per_frame_prob, alpha_adj, multi_thresh,
    )
    return frames, assigned, hits_out, best


def _classify_mibf_sharded(
    spark: SparkSession,
    docs: DataFrame,
    meta: tuple,
    seg_fetch,
    n_segments: int,
    per_frame_prob: np.ndarray,
    alpha_adj: float,
    multi_thresh: int,
    id_col: str,
    text_cols: list[str],
    pin_source: bool = True,
) -> DataFrame:
    """Multi-pass miBF classification for id arrays beyond the broadcast
    budget — the MI twin of ``categorizer._categorize_sharded``.

    Pass s broadcasts ONLY slot-range segment s of the uint16 id array
    (~``len(ids)/S`` bytes).  Each (probe, frame) entry of a document's
    gather matrix lands in exactly one segment, so pass s emits the
    non-empty entries it owns as a sparse (flat-index, raw-uint16) blob
    per document; one groupBy on a per-row surrogate key reassembles the
    full (h, n_frames) matrix and runs the normal counting + significance
    kernels (``_count_from_gather`` + ``_decide_batch``).  Empty slots
    (raw == 0) are never shipped — at the default 0.5 occupancy half the
    matrix stays implicit.  Cost vs single-pass: the corpus is hashed once
    per segment and the gather matrix rides one shuffle — the standard
    memory/IO trade, identical to the plain-Bloom sharded path.

    ``text_cols``: one column = single-read classify; two = paired mode
    (per-mate matrices reassembled separately, counts summed via
    ``_merge_counts``, the binomial test on the combined frame count —
    the ``classify(support, seq1, seq2)`` semantics).

    ``meta`` = (m_slots, h, w, labels, seeds, hash_family, canonical);
    ``seg_fetch(s, lo, hi)`` returns segment s's raw uint16 bytes — an
    in-memory slice (``classify_mibf``) or a parquet segment read
    (``mibf_store.classify_mibf_store``): the id array as a whole need
    not exist anywhere.
    """
    S = int(n_segments)
    m_slots, h, w, labels, seeds, family, canonical = meta
    bounds = _seg_bounds(m_slots, S)
    L = len(labels)
    M = len(text_cols)
    from ..session import pin_rows

    # pin the projected rows so the surrogate key is stable across the S
    # passes even for non-deterministic sources (see session.pin_rows;
    # pin_source=False = caller asserts a deterministic source, re-scan)
    keyed = pin_rows(
        docs.select(id_col, *text_cols).withColumn(
            "__row", F.monotonically_increasing_id()
        ),
        pin=pin_source,
    )
    id_field = docs.schema[id_col]
    tail = []
    for m in range(M):
        tail += [
            T.StructField(f"n_frames{m}", T.LongType(), False),
            T.StructField(f"idx{m}", T.BinaryType(), False),
            T.StructField(f"val{m}", T.BinaryType(), False),
        ]
    part_schema = T.StructType(
        [T.StructField("__row", T.LongType(), False), id_field] + tail
    )

    def seg_pass(s: int):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        bc = spark.sparkContext.broadcast(seg_fetch(s, lo, hi))

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # NOTE: this closure must never reference `sketch` — cloudpickle
            # would ship the full id array in every task, defeating the shard
            seg = np.frombuffer(bc.value, dtype=np.uint16)
            probe = MIBFSketch(
                m_slots, h, w, [], np.zeros(0, dtype=np.uint16), seeds,
                family, canonical,
            )
            cache: dict = {}
            for pdf in batches:
                out = {"__row": pdf["__row"].to_numpy(), id_col: pdf[id_col].to_numpy()}
                for m, tcol in enumerate(text_cols):
                    texts = pdf[tcol].fillna("").to_numpy()
                    rows, offsets = _frame_hash_rows(
                        texts, None, w, seeds, cache, canonical, family
                    )
                    n_docs = offsets.size - 1
                    frames = np.diff(offsets)
                    idx_blobs: list[bytes] = [b""] * n_docs
                    val_blobs: list[bytes] = [b""] * n_docs
                    if int(offsets[-1]):
                        pos = probe.positions_for(rows)
                        in_seg = (pos >= lo) & (pos < hi)
                        raw = np.zeros(pos.shape, dtype=np.uint16)
                        raw[in_seg] = seg[pos[in_seg] - lo]
                        ii, gg = np.nonzero(in_seg & (raw != 0))
                        if ii.size:
                            doc = np.searchsorted(offsets, gg, side="right") - 1
                            order = np.argsort(doc, kind="stable")
                            ii, gg, doc = ii[order], gg[order], doc[order]
                            # doc-local flat index: probe_row*frames[doc]+frame
                            e = (ii * frames[doc] + (gg - offsets[doc])).astype(
                                np.uint32
                            )
                            v = raw[ii, gg]
                            cut = np.searchsorted(doc, np.arange(n_docs + 1))
                            for d in range(n_docs):
                                a, b = int(cut[d]), int(cut[d + 1])
                                if b > a:
                                    idx_blobs[d] = e[a:b].tobytes()
                                    val_blobs[d] = v[a:b].tobytes()
                    out[f"n_frames{m}"] = frames
                    out[f"idx{m}"] = idx_blobs
                    out[f"val{m}"] = val_blobs
                yield pd.DataFrame(out)

        return keyed.mapInPandas(run, schema=part_schema)

    parts = seg_pass(0)
    for s in range(1, S):
        parts = parts.unionByName(seg_pass(s))
    blob_cols = [c for m in range(M) for c in (f"idx{m}", f"val{m}")]
    agg = parts.groupBy("__row").agg(
        F.first(id_col).alias(id_col),
        *[F.first(f"n_frames{m}").alias(f"n_frames{m}") for m in range(M)],
        F.collect_list(F.struct(*blob_cols)).alias("parts"),
    )
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("n_frames", T.LongType(), False),
            T.StructField("hits", T.ArrayType(T.StringType()), False),
            T.StructField("assigned", T.StringType(), False),
            T.StructField("best_score", T.DoubleType(), False),
        ]
    )
    decide_sk = MIBFSketch(
        m_slots, h, w, list(labels), np.zeros(0, dtype=np.uint16), seeds,
        family, canonical,
    )

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            mate_counts = []
            frames_total = np.zeros(n, dtype=np.int64)
            for m in range(M):
                frames = pdf[f"n_frames{m}"].to_numpy().astype(np.int64)
                frames_total += frames
                offsets = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(frames, out=offsets[1:])
                raw_b = np.zeros((h, int(offsets[-1])), dtype=np.uint16)
                # gather every segment blob of every row, then scatter the
                # whole batch in ONE fancy-index write: the doc-local flat
                # index e encodes (probe, frame) as probe*frames[row]+frame,
                # so global coords derive arithmetically — no per-row
                # (h x frames) temp allocation/copy in a Python loop
                idx_c: list[np.ndarray] = []
                val_c: list[np.ndarray] = []
                row_c: list[np.ndarray] = []
                for i, row_parts in enumerate(pdf["parts"]):
                    if frames[i] == 0:
                        continue
                    for p in row_parts:
                        bi = p[f"idx{m}"]
                        if len(bi):
                            e = np.frombuffer(bi, dtype=np.uint32)
                            idx_c.append(e)
                            val_c.append(np.frombuffer(p[f"val{m}"], dtype=np.uint16))
                            row_c.append(np.full(e.size, i, dtype=np.int64))
                if idx_c:
                    e = np.concatenate(idx_c).astype(np.int64)
                    v = np.concatenate(val_c)
                    ri = np.concatenate(row_c)
                    fc = frames[ri]
                    raw_b[e // fc, offsets[ri] + e % fc] = v
                mate_counts.append(
                    _count_from_gather(
                        offsets, raw_b & ID_MASK, (raw_b & SAT_BIT) != 0, L
                    )
                )
            keys, counts, full = (
                mate_counts[0] if M == 1 else _merge_counts(mate_counts)
            )
            assigned, hits, best = _decide_batch(
                n, frames_total, keys, counts, full, decide_sk,
                per_frame_prob, alpha_adj, multi_thresh,
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_frames": frames_total,
                    "hits": hits,
                    "assigned": assigned,
                    "best_score": best,
                }
            )

    return agg.mapInPandas(combine, schema=out_schema)


#: id(sketch) → ((applicationId, content-fp), Broadcast).  Keyed off the
#: object (module-level, weakref-evicted) rather than stored ON it so a
#: sketch stays deepcopy- and pickle-able — a Broadcast handle in the
#: instance __dict__ would crash copy.deepcopy/pickle with
#: BROADCAST_VARIABLE_NOT_LOADED on the driver.
_BC_CACHE: dict[int, tuple] = {}


def _sketch_broadcast(spark: SparkSession, sketch: MIBFSketch):
    """Session-scoped broadcast of the sketch payload, cached per sketch
    object.

    A fresh broadcast per classify call makes every worker re-fetch and
    first-touch the full uint16 id array on every call — at this VM's
    ~150 MB/s fault rate that is seconds per worker per call, and it grows
    with the worker count (an anti-scaling term measured in the round-4
    miBF scaling runs).  Real deployments classify many batches against
    one sketch; one broadcast per (sketch, Spark app) is the correct
    amortization.  The cache dies with the sketch object or the app.

    The cache key includes a cheap content checksum of the id array
    (length + uint64 sum — any in-place mutation the sketch API performs,
    e.g. OR-ing SAT_BIT, strictly changes it), so a sketch mutated after a
    classify is re-broadcast instead of silently classified against stale
    ids."""
    import weakref

    app = spark.sparkContext.applicationId
    fp = (sketch.ids.size, int(np.add.reduce(sketch.ids, dtype=np.uint64)))
    sid = id(sketch)
    cached = _BC_CACHE.get(sid)
    if cached is not None and cached[0] == (app, fp):
        return cached[1]
    if cached is not None and cached[0][0] == app:
        # stale broadcast invalidated by mutation: release its blocks now
        # (no job can be mid-flight with it — classify calls are
        # driver-sequential) instead of leaking until app exit
        cached[1].unpersist()
    payload = sketch.serialize()
    meta = (sketch.m_slots, sketch.num_hashes, sketch.shingle_w, sketch.labels,
            sketch.hash_family, sketch.canonical)
    bc = spark.sparkContext.broadcast((payload, meta, sketch.seeds))
    if sid not in _BC_CACHE:
        # evict on sketch GC (Spark's ContextCleaner reclaims the broadcast
        # blocks once the handle is dropped); runs during destruction, so
        # an id()-reuse by a NEW sketch can never race a dead entry
        weakref.finalize(sketch, _BC_CACHE.pop, sid, None)
    _BC_CACHE[sid] = ((app, fp), bc)
    return bc


def classify_mibf(
    spark: SparkSession,
    docs: DataFrame,
    sketch: MIBFSketch,
    alpha: float = 1e-10,
    multi_thresh: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_broadcast_bytes: int | None = None,
    pin_source: bool = True,
) -> DataFrame:
    """Classify every document against the miBF — broadcast + one
    mapInPandas pass, zero shuffle (the MI twin of ``categorize``).

    ``alpha`` is the ``-s`` significance (min_FPR=100 → 1e-10,
    MIBFClassifier defaults); Bonferroni-adjusted by the label count.
    Output: (id, n_frames, hits ranked best-first, assigned, best_score
    = -10*log10 p of the best hit).

    ``max_broadcast_bytes`` caps the id-array bytes broadcast per pass:
    a sketch larger than the cap is evaluated in slot-range segments
    (``_classify_mibf_sharded``) — the executor-memory escape hatch for
    very large id arrays.  None = single pass (default).

    ``pin_source`` (sharded mode only): pin the projected corpus once so
    all segment passes stitch one consistent row set; set False only for
    sources that re-evaluate deterministically (see ``session.pin_rows``).
    """
    from ..session import ensure_workers

    ensure_workers(spark)
    per_frame_prob = sketch.per_frame_prob()
    alpha_adj = alpha / max(1, len(sketch.labels))
    if (
        max_broadcast_bytes is not None
        and sketch.ids.nbytes > max_broadcast_bytes
    ):
        n_seg = _clamp_segments(-(-sketch.ids.nbytes // max_broadcast_bytes))
        ids = sketch.ids
        return _classify_mibf_sharded(
            spark, docs, _sketch_meta(sketch),
            lambda s, lo, hi: ids[lo:hi].tobytes(),
            n_seg, per_frame_prob, alpha_adj, multi_thresh, id_col, [text_col],
            pin_source=pin_source,
        )
    bc = _sketch_broadcast(spark, sketch)
    id_field = docs.schema[id_col]
    schema = T.StructType(
        [
            id_field,
            T.StructField("n_frames", T.LongType(), False),
            T.StructField("hits", T.ArrayType(T.StringType()), False),
            T.StructField("assigned", T.StringType(), False),
            T.StructField("best_score", T.DoubleType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl, (m, h, w, labels, fam, canon), sd = bc.value
        sk = MIBFSketch.deserialize(
            pl, m, h, w, labels, sd, hash_family=fam, canonical=canon
        )
        cache: dict = {}
        for pdf in batches:
            frames, assigned, hits, best = _classify_batch(
                pdf[text_col].to_numpy(), sk, per_frame_prob, alpha_adj,
                multi_thresh, cache,
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_frames": frames,
                    "hits": hits,
                    "assigned": assigned,
                    "best_score": best,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def classify_mibf_pairs(
    spark: SparkSession,
    docs: DataFrame,
    sketch: MIBFSketch,
    alpha: float = 1e-10,
    multi_thresh: int = 2,
    id_col: str = "doc_id",
    text1_col: str = "text1",
    text2_col: str = "text2",
    max_broadcast_bytes: int | None = None,
    pin_source: bool = True,
) -> DataFrame:
    """Paired miBF classification (``-e``): both mates' per-ID counts SUM
    and the binomial test runs on the combined frame count — the
    semantics of ``classify(support, seq1, seq2)`` /
    ``filterPairedRead`` (MIBFClassifier.hpp:753-835), where
    ``support.query(itr1, itr2, minCount)`` accumulates one count set
    over both reads.  A null/short mate contributes zero frames.

    ``max_broadcast_bytes``: same sharded escape hatch as
    ``classify_mibf`` (per-mate gather matrices reassembled, counts
    summed before the significance test).
    """
    from ..session import ensure_workers

    ensure_workers(spark)
    per_frame_prob = sketch.per_frame_prob()
    alpha_adj = alpha / max(1, len(sketch.labels))
    if (
        max_broadcast_bytes is not None
        and sketch.ids.nbytes > max_broadcast_bytes
    ):
        n_seg = _clamp_segments(-(-sketch.ids.nbytes // max_broadcast_bytes))
        ids = sketch.ids
        return _classify_mibf_sharded(
            spark, docs, _sketch_meta(sketch),
            lambda s, lo, hi: ids[lo:hi].tobytes(),
            n_seg, per_frame_prob, alpha_adj, multi_thresh, id_col,
            [text1_col, text2_col], pin_source=pin_source,
        )
    bc = _sketch_broadcast(spark, sketch)
    id_field = docs.schema[id_col]
    schema = T.StructType(
        [
            id_field,
            T.StructField("n_frames", T.LongType(), False),
            T.StructField("hits", T.ArrayType(T.StringType()), False),
            T.StructField("assigned", T.StringType(), False),
            T.StructField("best_score", T.DoubleType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl, (m, h, w, labels, fam, canon), sd = bc.value
        sk = MIBFSketch.deserialize(
            pl, m, h, w, labels, sd, hash_family=fam, canonical=canon
        )
        cache: dict = {}
        for pdf in batches:
            t1 = pdf[text1_col].fillna("").to_numpy()
            t2 = pdf[text2_col].fillna("").to_numpy()
            f1, k1, c1, fu1 = _count_batch(t1, sk, cache)
            f2, k2, c2, fu2 = _count_batch(t2, sk, cache)
            keys, counts, full = _merge_counts([(k1, c1, fu1), (k2, c2, fu2)])
            frames = f1 + f2
            assigned, hits, best = _decide_batch(
                frames.size, frames, keys, counts, full, sk,
                per_frame_prob, alpha_adj, multi_thresh,
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_frames": frames,
                    "hits": hits,
                    "assigned": assigned,
                    "best_score": best,
                }
            )

    return docs.select(id_col, text1_col, text2_col).mapInPandas(run, schema=schema)


_MIBF_SCHEMA = T.StructType(
    [
        T.StructField("m_slots", T.LongType(), False),
        T.StructField("num_hashes", T.IntegerType(), False),
        T.StructField("shingle_w", T.IntegerType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), False),
        T.StructField("seeds", T.ArrayType(T.StringType()), True),
        T.StructField("ids", T.BinaryType(), False),
        T.StructField("hash_family", T.StringType(), True),
        T.StructField("canonical", T.BooleanType(), True),
    ]
)


def save_mibf(spark: SparkSession, sketch: MIBFSketch, path: str) -> None:
    """Persist a miBF as a one-row parquet table (the ``.bf``+INI analog
    of the MI product line — BioBloomMIMaker's output contract)."""
    seeds = None
    if sketch.seeds is not None:
        seeds = ["".join("1" if b else "0" for b in row) for row in sketch.seeds]
    spark.createDataFrame(
        [(sketch.m_slots, sketch.num_hashes, sketch.shingle_w,
          list(sketch.labels), seeds, sketch.serialize(),
          sketch.hash_family, sketch.canonical)],
        _MIBF_SCHEMA,
    ).write.mode("overwrite").parquet(path)


def load_mibf(spark: SparkSession, path: str) -> MIBFSketch:
    r = spark.read.parquet(path).collect()[0].asDict()
    seeds = seed_masks_to_arrays(list(r["seeds"]) if r["seeds"] else None,
                                 int(r["shingle_w"]))
    return MIBFSketch.deserialize(
        bytes(r["ids"]), int(r["m_slots"]), int(r["num_hashes"]),
        int(r["shingle_w"]), list(r["labels"]), seeds, copy=True,
        # pre-round-4 saves carry no family columns → poly, non-canonical
        hash_family=str(r.get("hash_family") or "poly"),
        canonical=bool(r.get("canonical") or False),
    )


def mibf_summarize(result: DataFrame) -> DataFrame:
    """Per-label assignment summary — the MI ``_summary.tsv`` analog
    (ResultsManager.updateSummaryData over signifResults)."""
    return (
        result.groupBy("assigned")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.avg("n_frames").alias("avg_frames"))
        .orderBy("assigned")
    )
