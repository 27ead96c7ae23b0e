"""Filter construction — the BioBloomMaker job, Spark-native.

Reference lifecycle (/root/reference/BioBloomMaker/BioBloomMaker.cpp:
110-543, traced in SURVEY.md §3.1): size the filter from a counting
pre-pass, then insert every k-mer of every reference sequence, then store
bitmap + metadata.  Single machine, OpenMP threads over a serialized
reader.

Spark lifecycle here (partition strategy, the default):

1. **Sparse partial pass** — ONE zero-shuffle ``mapInPandas`` over the
   corpus: each task shingles its own documents and emits, per filter key,
   its unique frame hashes split into S hash-prefix slices (plus a
   companion row with counters and the HLL/CMS/t-digest/KLL sketches).
   No sizing pre-scan: the reference's calcExpectedEntries counts every
   k-mer occurrence (BloomFilterGenerator.h:108-141) and that exact count
   rides along per slice, so sizing happens where the data already is.
2. **Segmented merge** — one reducer per (key, slice): sorted-set union of
   the slice's hash blobs, slice bitmap sized from the slice's own insert
   total (published formulas, BloomFilterInfo.h:57-76), sequential
   fastrange + reduceat-OR scatter.  Merge parallelism is keys × S; no
   single-reducer 10^7-hash sort/scatter hotspot.
3. **Assembly** — one row per filter: memcpy the S slices into the final
   bitmap, compute registry stats, attach the slice word-offset table
   (storeFilter/printInfoFile analog, BloomFilterGenerator.cpp:71,
   BloomFilterInfo.cpp:81-116); per-partition lineage rows make a killed
   job resume from completed partitions (SURVEY.md §7.3).

The bucketed strategy (huge/high-cardinality filter sets) keeps the
salted-shuffle shape: docs shuffle once to (key, bucket) groups, dense
partials two-level-merge per key.

At 100 TB: the corpus is read once and never shuffled (partition
strategy); everything that moves is sketch-sized.
"""

from __future__ import annotations

import hashlib
import os
import uuid
import zlib
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import BloomParams, BuildConfig
from ..functions.text import batch_frames
from ..sketch import (
    BloomSketch,
    CountMinSketch,
    HLLSketch,
    KLLSketch,
    TDigestSketch,
    approx_fpr,
    blocked_size_bits,
    optimal_hash_num,
    optimal_size_bits,
    resolve_block_layout,
)
from ..sources.tables import (
    LINEAGE_SCHEMA,
    PARTIAL_SCHEMA,
    REGISTRY_LAYOUT_VERSION,
    REGISTRY_SCHEMA,
)

__all__ = ["size_filters", "build_filters", "load_registry", "merge_registries"]

_HLL_P = 14
_CMS_W, _CMS_D = 8192, 5


#: every whitespace codepoint Python's str.split() honors (ASCII + unicode
#: spaces) — the translate() charset for the token-count upper bound
_WS_CHARS = (
    " \t\n\r\x0b\x0c\x1c\x1d\x1e\x1f\x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)


def frames_upper_bound_col(text_col: str, shingle_w: int):
    """JVM column: upper bound on a doc's shingle-frame count, by
    *whitespace character* counting — no array allocation (a regex-split
    agg cost more than the whole partial build on large corpora, and a
    `\\s` regexp_replace measured 12 s of an 87 s build; translate() is
    non-regex and ~free).  tokenize() splits on any whitespace run and
    tokens <= whitespace chars + 1 always (a run of j ws chars separates
    at most one boundary but counts j), so this is a true upper bound —
    exact for the extractor's single-space output contract.  Overcounting
    only makes a filter conservatively larger, same spirit as the
    reference counting duplicate k-mers (BloomFilterGenerator.h:108-141).
    """
    t = F.trim(F.col(text_col))
    n_tokens_ub = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.translate(t, _WS_CHARS, "")) + 1
    )
    return F.greatest(F.lit(0), n_tokens_ub - F.lit(shingle_w - 1))


def size_filters(
    docs: DataFrame, key_col: str, text_col: str, params: BloomParams
) -> dict[str, dict]:
    """Sizing pre-pass: per filter key → expected entries and (m, h).

    Expected entries = total frames (upper bound on distinct, exactly the
    reference's choice: it counts every k-mer occurrence,
    BloomFilterGenerator.h:108-141 — duplicates only make the filter
    conservatively large).
    """
    frames_ub = frames_upper_bound_col(text_col, params.shingle_w)
    agg = (
        docs.select(key_col, text_col)
        .groupBy(key_col)
        .agg(F.sum(frames_ub).alias("frames"), F.count(F.lit(1)).alias("docs"))
        .collect()
    )
    h, block_bits = resolve_block_layout(params.fpr, params.num_hashes, params.block_bits)
    out = {}
    for row in agg:
        n = int(row["frames"] or 0)
        if block_bits:
            m = min(blocked_size_bits(n, params.fpr, h, block_bits), params.max_bits)
        else:
            m = min(optimal_size_bits(n, params.fpr, h), params.max_bits)
        out[str(row[key_col])] = {
            "expected_entries": n,
            "n_docs": int(row["docs"]),
            "m_bits": m,
            "num_hashes": h,
            "block_bits": block_bits,
        }
    return out


def _estimate_total_bits(docs: DataFrame, params: BloomParams) -> int | None:
    """Metadata-only total-bitmap-size estimate for the auto strategy pick
    — the analog of the reference sizing filters from input *file sizes*
    (-n / calcExpectedEntries over file length, BloomFilterGenerator.h:
    108-141) rather than a corpus scan.  Returns None when the input has
    no file listing (in-memory DataFrames) — callers treat that as small.

    Σ_k m_k ≈ bits_per_entry × Σ_k n_k is key-count-independent, so one
    aggregate estimate suffices: entries ≈ compressed bytes / ~3 (web text
    in parquet+snappy runs ~3-6 bytes per token; underestimating
    bytes/token overestimates entries, which only flips to the bucketed
    strategy early — the safe direction).
    """
    try:
        files = docs.inputFiles()
    except Exception:  # pragma: no cover - exotic sources
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        path = uri[5:] if uri.startswith("file:") else uri
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    entries = max(1, total // 3)
    h, bb = resolve_block_layout(params.fpr, params.num_hashes, params.block_bits)
    if bb:
        return blocked_size_bits(entries, params.fpr, h, bb)
    return optimal_size_bits(entries, params.fpr, h)


def _pack_dense(raw: bytes) -> bytes:
    """Dense bitmap payload: zlib only when it actually pays (low-occupancy
    bitmaps shrink 10-50x; half-full ones barely shrink and the deflate
    pass costs more than the shuffle bytes it saves)."""
    z = zlib.compress(raw, 1)
    return b"D" + z if len(z) < (len(raw) * 3) // 4 else b"E" + raw


def _snapshot_path(partials_path: str) -> str:
    return partials_path.rstrip("/") + "_snapshot"


def _read_snapshot(partials_path: str) -> str | None:
    try:
        with open(_snapshot_path(partials_path)) as f:
            return f.read().strip()
    except OSError:
        return None


def _write_snapshot(partials_path: str, fp: str) -> None:
    with open(_snapshot_path(partials_path), "w") as f:
        f.write(fp)


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
        bloom = BloomSketch(
            m_bits=meta["m_bits"], num_hashes=meta["num_hashes"],
            block_bits=meta.get("block_bits", params.block_bits),
            **_family_kwargs(params),
        )
        hll = HLLSketch(p=_HLL_P)
        cms = CountMinSketch(width=_CMS_W, depth=_CMS_D)
        td = TDigestSketch()
        kll = KLLSketch()
        sub = None
        if subtract_bits is not None:
            sm, sh_, sb, sseg = subtract_meta
            sub = BloomSketch.deserialize(
                subtract_bits, sm, sh_, block_bits=sb, seg_offsets=sseg,
                **_family_kwargs(params),
            )
        frames, _offs, tok_hashes, tok_counts = batch_frames(
            pdf[text_col].to_numpy(), w, canonical=params.canonical,
            hash_family=params.hash_family,
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
                "seg": [-1],
                "n_docs": [len(pdf)],
                "n_inserted": [bloom.n_inserted],
                "n_new": [bloom.n_new],
                "n_redundant": [bloom.n_redundant],
                # partials are ~1%-occupancy bitmaps: zlib-1 shrinks the
                # shuffle/merge bytes 10-50x (the dominant build cost at
                # large m); the final registry bitmap stays raw
                "bitmap": [b"D" + zlib.compress(bloom.serialize(), 1)],
                "hll": [hll.serialize()],
                "cms": [cms.serialize()],
                "tdigest": [td.serialize()],
                "kll": [kll.serialize()],
            }
        )[[f.name for f in PARTIAL_SCHEMA.fields]]

    return fn


_PARTIAL_COLS = [
    "filter_id", "bucket", "seg", "n_docs", "n_inserted", "n_new",
    "n_redundant", "bitmap", "hll", "cms", "tdigest", "kll",
]


def _family_kwargs(params: BloomParams) -> dict:
    """BloomSketch kwargs selecting the probe family (native K-M vs the
    published ntHash NTM64 for DNA .bf interop)."""
    if params.hash_family == "nthash":
        return {"hash_family": "nthash", "nt_k": params.shingle_w}
    return {}


def _seg_layout(params: BloomParams, build: BuildConfig) -> tuple[int, int, int]:
    """(num_hashes, block_bits, S) for the partition-strategy build.
    Hash-prefix segmentation requires the single-word layout (an item's
    whole footprint lives in the word picked by its hash); other layouts
    run with S=1 (one slice = the whole bitmap)."""
    h, bb = resolve_block_layout(params.fpr, params.num_hashes, params.block_bits)
    S = build.merge_segments if bb == 64 else 1
    return h, bb, S


def _pinned_seg_words(meta: dict, S: int) -> np.ndarray:
    """Equal-split per-segment word counts for an externally pinned m
    (progressive mode rebuilds into a FIXED layout across iterations so
    incremental OR-merge stays bitmap-compatible).  Deterministic; every
    segment gets >= 1 word (a zero-width segment would alias its probes
    onto its neighbour's words)."""
    total_words = meta["m_bits"] // 64
    base, rem = divmod(total_words, S)
    return np.asarray(
        [max(1, base + (1 if s < rem else 0)) for s in range(S)], dtype=np.int64
    )


def _seg_slice_bits(n_ins_seg: int, params: BloomParams, h: int, bb: int, S: int) -> int:
    """Sizing for ONE hash-prefix slice from that slice's own (exact,
    duplicate-counting) insert total — the same published formulas as the
    global sizing (BloomFilterInfo.h:57-76), applied per slice.  Hash
    prefixes are uniform, so slices self-balance; the FPR target holds per
    slice and therefore globally."""
    cap = max(64, ((params.max_bits // S) // 64) * 64)
    if bb:
        return min(blocked_size_bits(n_ins_seg, params.fpr, h, bb), cap)
    return min(optimal_size_bits(n_ins_seg, params.fpr, h), cap)


_U48 = np.uint64(1) << np.uint64(48)


def _pack_slice_hashes(u: np.ndarray, base) -> bytes:
    """Sorted unique uint64 slice hashes → ``b"Q"`` 6-byte-delta blob.

    The partials shuffle is the build's one non-scaling resource at fixed
    hardware (BENCH.md round-4 stage decomposition: ~14 s of the 2M-page
    build is core-count-independent byte movement), so spend (scaling) CPU
    to shrink it: deltas of segment-local sorted hashes fit 48 bits
    whenever the slice is reasonably populated (mean delta ≈ 2^58/n), and
    6/8 encoding cuts the exchange 25%.  Sparse slices whose deltas
    overflow 48 bits fall back to the raw ``b"R"`` layout (they are small
    by construction).  Little-endian layout (asserted by the roundtrip
    test); ``base`` = the segment's hash-prefix floor, so the first delta
    is segment-relative."""
    if u.size == 0:
        return b"R"
    d = np.empty(u.size, dtype=np.uint64)
    d[0] = u[0] - np.uint64(base)
    np.subtract(u[1:], u[:-1], out=d[1:])
    if int(d.max()) >= int(_U48):
        return b"R" + u.tobytes()
    six = np.ascontiguousarray(d.astype("<u8")).view(np.uint8).reshape(-1, 8)[:, :6]
    return b"Q" + six.tobytes()


def _unpack_slice_hashes(payload: bytes, base) -> np.ndarray:
    """Inverse of ``_pack_slice_hashes`` (also accepts legacy raw ``b"R"``
    rows, e.g. a resume checkpoint written by an older build)."""
    tag, body = payload[:1], payload[1:]
    if tag == b"R":
        return np.frombuffer(body, dtype=np.uint64)
    if tag != b"Q":
        raise ValueError(f"unknown slice-hash tag {tag!r}")
    six = np.frombuffer(body, dtype=np.uint8).reshape(-1, 6)
    d = np.zeros((six.shape[0], 8), dtype=np.uint8)
    d[:, :6] = six
    vals = d.reshape(-1).view("<u8").astype(np.uint64)
    np.cumsum(vals, out=vals)
    vals += np.uint64(base)
    return vals


def _build_partition_fn(params: BloomParams, build: BuildConfig, text_col: str,
                        key_col: str, subtract_bits: bytes | None,
                        subtract_meta: tuple | None,
                        skip_buckets: frozenset | None = None):
    """mapInPandas kernel: one *input partition* → S sparse slice rows +
    one companion row per key.

    The zero-shuffle build strategy: every task accumulates state for
    every filter key over the documents it already holds (like the
    categorizer holds every filter bitmap, and like the reference's
    threads all inserting into shared filters,
    BloomFilterGenerator.h:156-183).  The corpus never moves; only
    sketch-sized partials do.

    Emitted per key:
    - S slice rows (``seg`` 0..S-1): the partition's *unique frame hashes*
      whose top log2(S) bits equal ``seg`` (raw, tag ``b"R"`` — uniform
      64-bit hashes are incompressible; zlib measured 6% shrink for ~0.5 s
      per task), plus that slice's pre-dedup frame count (its sizing
      input).  No dense bitmap is ever allocated map-side — no
      100s-of-MB page-fault/scatter storms (measured: dense-per-task made
      16 cores *slower* than 4).
    - one companion row (``seg`` -1): doc/frame counters + the HLL / CMS /
      t-digest / KLL sketches.

    No sizing pre-pass feeds this kernel: slice reducers size themselves
    from the exact per-slice counts they receive (the separate corpus
    scan the old flow spent 20-30% of build wall-time on is gone).
    """
    from pyspark import TaskContext

    w = params.shingle_w
    h, bb, S = _seg_layout(params, build)
    k = S.bit_length() - 1
    shift = np.uint64(64 - k) if k else None

    def fn(batches):
        if skip_buckets:
            ctx0 = TaskContext.get()
            if ctx0 is not None and int(ctx0.partitionId()) in skip_buckets:
                return  # resumed build: this partition's partials exist
        sub = None
        if subtract_bits is not None:
            sm, sh_, sb, sseg = subtract_meta
            sub = BloomSketch.deserialize(
                subtract_bits, sm, sh_, block_bits=sb, seg_offsets=sseg,
                **_family_kwargs(params),
            )
        hashes_acc: dict[str, list] = {}
        state: dict[str, tuple] = {}
        n_docs: dict[str, int] = {}
        seg_counts: dict[str, np.ndarray] = {}
        for pdf in batches:
            for fid, grp in pdf.groupby(key_col):
                fid = str(fid)
                if fid not in state:
                    state[fid] = (
                        HLLSketch(p=_HLL_P),
                        CountMinSketch(width=_CMS_W, depth=_CMS_D),
                        TDigestSketch(),
                        KLLSketch(),
                    )
                    hashes_acc[fid] = []
                    n_docs[fid] = 0
                    seg_counts[fid] = np.zeros(S, dtype=np.int64)
                hll, cms, td, kll = state[fid]
                frames, _offs, tok_hashes, tok_counts = batch_frames(
                    grp[text_col].to_numpy(), w, canonical=params.canonical,
                    hash_family=params.hash_family,
                )
                if sub is not None and frames.size:
                    frames = frames[~sub.contains_batch(frames)]
                if k:
                    seg_counts[fid] += np.bincount(
                        (frames >> shift).astype(np.int64), minlength=S
                    )
                else:
                    seg_counts[fid][0] += int(frames.size)
                hashes_acc[fid].append(np.unique(frames))
                hll.update_batch(frames)
                cms.update_batch(tok_hashes)
                lengths = tok_counts.astype(np.float64)
                td.update_batch(lengths)
                kll.update_batch(lengths)
                n_docs[fid] += len(grp)
        if not state:
            return
        ctx = TaskContext.get()
        bucket = int(ctx.partitionId()) if ctx is not None else 0
        rows = []
        for fid, (hll, cms, td, kll) in state.items():
            uniq = np.unique(np.concatenate(hashes_acc[fid]))
            counts = seg_counts[fid]
            if k:
                edges = np.arange(1, S, dtype=np.uint64) << shift
                bounds = np.concatenate(([0], np.searchsorted(uniq, edges), [uniq.size]))
            else:
                bounds = np.asarray([0, uniq.size])
            for s in range(S):
                lo, hi = int(bounds[s]), int(bounds[s + 1])
                if hi == lo and counts[s] == 0:
                    continue
                seg_base = (np.uint64(s) << shift) if k else np.uint64(0)
                rows.append((
                    fid, bucket, s, 0, int(counts[s]), 0, 0,
                    _pack_slice_hashes(uniq[lo:hi], seg_base),
                    None, None, None, None,
                ))
            rows.append((
                fid, bucket, -1, n_docs[fid], int(counts.sum()), 0, 0, b"C",
                hll.serialize(), cms.serialize(), td.serialize(), kll.serialize(),
            ))
        yield pd.DataFrame(rows, columns=_PARTIAL_COLS)

    return fn


def _seg_reduce_fn(params: BloomParams, build: BuildConfig, pinned: dict | None,
                   out_schema):
    """applyInPandas kernel per (filter_id, seg) group.

    ``seg >= 0``: union the group's sorted hash blobs, size the slice from
    the group's exact insert total (or the pinned equal-split), scatter the
    slice bitmap sequentially (monotone fastrange + reduceat-OR — see
    sketch.bloom).  ``seg == -1``: merge the companion sketches.  All
    groups run in parallel: merge parallelism is filters x S.
    """
    from ..sketch.bloom import or_scatter_sorted, probe_words64
    from ..sketch.hashing import km_probe, mulhigh64

    h, bb, S = _seg_layout(params, build)
    k = S.bit_length() - 1

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        fid, seg = str(key[0]), int(key[1])
        if seg == -1:
            hll = HLLSketch(p=_HLL_P)
            cms = CountMinSketch(width=_CMS_W, depth=_CMS_D)
            td = TDigestSketch()
            kll = KLLSketch()
            n_docs = n_ins = 0
            for _, row in pdf.iterrows():
                n_docs += int(row["n_docs"])
                n_ins += int(row["n_inserted"])
                if row["hll"] is not None:
                    hll = hll.merge(HLLSketch.deserialize(bytes(row["hll"]), p=_HLL_P))
                if row["cms"] is not None:
                    cms = cms.merge(CountMinSketch.deserialize(bytes(row["cms"]), _CMS_W, _CMS_D))
                if row["tdigest"] is not None:
                    td = td.merge(TDigestSketch.deserialize(bytes(row["tdigest"])))
                if row["kll"] is not None:
                    kll = kll.merge(KLLSketch.deserialize(bytes(row["kll"])))
            return pd.DataFrame(
                [(fid, 0, -1, n_docs, n_ins, 0, 0, b"C",
                  hll.serialize(), cms.serialize(), td.serialize(), kll.serialize())],
                columns=_PARTIAL_COLS,
            )
        n_ins_seg = int(pdf["n_inserted"].sum())
        seg_base = (np.uint64(seg) << np.uint64(64 - k)) if k else np.uint64(0)
        parts = [
            _unpack_slice_hashes(bytes(p), seg_base) for p in pdf["bitmap"]
        ]
        uniq = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
        if pinned is not None:
            m_seg = int(_pinned_seg_words(pinned[fid], S)[seg]) * 64
        else:
            m_seg = _seg_slice_bits(n_ins_seg, params, h, bb, S)
        if bb == 64:
            words = np.zeros(m_seg // 64, dtype=np.uint64)
            if uniq.size:
                h1, h2 = km_probe(uniq)
                local = mulhigh64(h1 << np.uint64(k) if k else h1,
                                  np.uint64(words.size)).astype(np.int64)
                or_scatter_sorted(words, local, probe_words64(h2, h))
            payload = b"S" + words.tobytes()
        else:
            sk = BloomSketch(m_bits=m_seg, num_hashes=h, block_bits=bb,
                             **_family_kwargs(params))
            if uniq.size:
                sk.update_batch(uniq, assume_unique=True)
            payload = b"S" + sk.serialize()
        return pd.DataFrame(
            [(fid, 0, seg, 0, n_ins_seg, int(uniq.size),
              n_ins_seg - int(uniq.size), payload, None, None, None, None)],
            columns=_PARTIAL_COLS,
        )

    return fn


def _assemble_fn(params: BloomParams, build: BuildConfig, pinned: dict | None):
    """applyInPandas kernel per filter: order the S slice bitmaps, memcpy
    them into the final bitmap, compute registry stats, attach the word
    offsets.  Pure assembly — the heavy lifting happened in parallel in
    the slice reducers."""
    h, bb, S = _seg_layout(params, build)

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        fid = str(key[0])
        comp = pdf[pdf["seg"] == -1].iloc[0]
        slices = {int(r["seg"]): r for _, r in pdf[pdf["seg"] >= 0].iterrows()}
        payloads, n_new = [], 0
        if pinned is not None:
            seg_words = _pinned_seg_words(pinned[fid], S)
        for s in range(S):
            row = slices.get(s)
            if row is not None:
                payloads.append(bytes(row["bitmap"])[1:])
                n_new += int(row["n_new"])
            elif pinned is not None:
                payloads.append(b"\0" * (int(seg_words[s]) * 8))
            else:
                payloads.append(b"\0" * (_seg_slice_bits(0, params, h, bb, S) // 8))
        word_counts = np.asarray([len(p) // 8 for p in payloads], dtype=np.int64)
        offsets = np.concatenate(([0], np.cumsum(word_counts)))
        bitmap = b"".join(payloads)
        m_bits = int(offsets[-1]) * 64
        n_docs, n_ins = int(comp["n_docs"]), int(comp["n_inserted"])
        seg_off = offsets if (bb == 64 and S > 1) else None
        sk = BloomSketch(
            m_bits=m_bits, num_hashes=h,
            bits=np.frombuffer(bitmap, dtype=np.uint8),
            block_bits=bb, seg_offsets=seg_off,
        )
        hll = (
            HLLSketch.deserialize(bytes(comp["hll"]), p=_HLL_P)
            if comp["hll"] is not None
            else HLLSketch(p=_HLL_P)
        )
        expected = pinned[fid]["expected_entries"] if pinned is not None else n_ins
        return pd.DataFrame(
            {
                "filter_id": [fid],
                "layout_version": [REGISTRY_LAYOUT_VERSION],
                "m_bits": [m_bits],
                "num_hashes": [h],
                "block_bits": [bb],
                "shingle_w": [params.shingle_w],
                "canonical": [params.canonical],
                "hash_family": [params.hash_family],
                "target_fpr": [params.fpr],
                "expected_entries": [int(expected)],
                "n_docs": [n_docs],
                "n_inserted": [n_ins],
                # slices partition the hash space → Σ per-slice distinct is
                # the EXACT distinct count (improves on the reference's
                # scan-order counter, SURVEY §7.4)
                "num_entries": [n_new],
                "redundant_entries": [n_ins - n_new],
                "approx_fpr": [approx_fpr(m_bits, n_new, h)],
                "occupancy_fpr": [sk.fpr_from_occupancy()],
                "distinct_frames_hll": [hll.estimate()],
                "seg_offsets": [offsets.tobytes() if seg_off is not None else None],
                "bitmap": [bitmap],
                "hll": [comp["hll"]],
                "cms": [comp["cms"]],
                "tdigest": [comp["tdigest"]],
                "kll": [comp["kll"]],
            }
        )[[f.name for f in REGISTRY_SCHEMA.fields]]

    return fn


def _merge_partials_fn(sizing: dict, out_schema, final: bool, params: BloomParams):
    """applyInPandas kernel merging partial rows (OR bitmaps, max registers,
    add counters, re-compress digests)."""

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        filter_id = str(key[0])
        meta = sizing[filter_id]
        m, h = meta["m_bits"], meta["num_hashes"]
        bb = meta.get("block_bits", params.block_bits)
        bloom = None  # densify lazily: sparse unions never touch a bitmap
        saw_dense = False
        sparse_parts: list[np.ndarray] = []
        hll = HLLSketch(p=_HLL_P)
        cms = CountMinSketch(width=_CMS_W, depth=_CMS_D)
        td = TDigestSketch()
        kll = KLLSketch()
        n_docs = n_ins = n_new = n_red = 0
        for _, row in pdf.iterrows():
            payload = bytes(row["bitmap"])
            tag, body = payload[:1], payload[1:]
            if tag == b"R":
                sparse_parts.append(np.frombuffer(body, dtype=np.uint64))
            elif tag == b"H":
                sparse_parts.append(
                    np.frombuffer(zlib.decompress(body), dtype=np.uint64)
                )
            elif tag in (b"D", b"E"):
                saw_dense = True
                if bloom is None:
                    bloom = BloomSketch(m_bits=m, num_hashes=h, block_bits=bb,
                                        **_family_kwargs(params))
                raw = zlib.decompress(body) if tag == b"D" else body
                bloom.bits |= np.frombuffer(raw, dtype=np.uint8)
            else:  # pragma: no cover - unknown tag
                raise ValueError(f"unknown partial bitmap tag {tag!r}")
            n_new += int(row["n_new"])
            n_red += int(row["n_redundant"])
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
        uniq = (
            np.unique(np.concatenate(sparse_parts))
            if sparse_parts
            else np.empty(0, dtype=np.uint64)
        )
        if not final and bloom is None and uniq.nbytes < m // 8:
            # pure-sparse union stays sparse: level-1 merges are then just
            # sorted-set unions; the single densify happens at the final
            # merge — one scatter pass per filter total
            payload = b"R" + uniq.tobytes()
            n_new_out, n_red_out = int(uniq.size), n_ins - int(uniq.size)
        else:
            if bloom is None:
                bloom = BloomSketch(m_bits=m, num_hashes=h, block_bits=bb,
                                    **_family_kwargs(params))
            if uniq.size:
                bloom.update_batch(uniq, assume_unique=True)
            payload = (
                _pack_dense(bloom.serialize()) if not final else bloom.serialize()
            )
            n_new_out, n_red_out = n_new, n_red
        common = {
            "filter_id": [filter_id],
            "n_docs": [n_docs],
            "n_inserted": [n_ins],
            "bitmap": [payload],
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
                    "seg": [-1],
                    "n_new": [n_new_out],
                    "n_redundant": [n_red_out],
                }
            )[[f.name for f in PARTIAL_SCHEMA.fields]]
        # pure-sparse lineage → num_entries is the EXACT distinct count
        # (improves on the reference's scan-order counter, SURVEY §7.4);
        # any dense partial in the ancestry degrades it to the documented
        # additive overcount
        num_entries = int(uniq.size) if (sparse_parts and not saw_dense) else n_new
        return pd.DataFrame(
            {
                **common,
                "layout_version": [REGISTRY_LAYOUT_VERSION],
                "m_bits": [m],
                "num_hashes": [h],
                "block_bits": [bb],
                "shingle_w": [params.shingle_w],
                "canonical": [params.canonical],
                "hash_family": [params.hash_family],
                "target_fpr": [params.fpr],
                "expected_entries": [meta["expected_entries"]],
                "num_entries": [num_entries],
                "redundant_entries": [n_ins - num_entries],
                "approx_fpr": [approx_fpr(m, num_entries, h)],
                "occupancy_fpr": [bloom.fpr_from_occupancy()],
                "distinct_frames_hll": [hll.estimate()],
                "seg_offsets": [None],
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
    expected_sizing: dict | None = None,
    snapshot_id: str | None = None,
) -> DataFrame:
    """Build one Bloom filter (+ companion sketches) per value of key_col.

    Returns the registry DataFrame (one row per filter).  When
    ``partials_path`` is set, per-bucket partials are checkpointed there and
    a re-invocation resumes, recomputing only missing (filter, bucket)
    groups — the north rule's mid-build resumability.
    ``subtract`` = (bitmap_bytes, m_bits, num_hashes[, block_bits]) veto filter.
    """
    from ..session import ensure_workers

    ensure_workers(spark)
    params = params or BloomParams()
    build = build or BuildConfig()
    job_id = job_id or uuid.uuid4().hex[:12]

    if keys is not None:
        keys = list(keys)
        docs = docs.filter(F.col(key_col).isin(keys))
    docs = docs.filter(F.col(key_col).isNotNull() & F.col(text_col).isNotNull())

    # expected_sizing pins (m, h) externally — the progressive mode re-builds
    # into a fixed-size bitmap across iterations so merges stay compatible
    pinned = expected_sizing

    sub_bits, sub_meta = (
        (
            subtract[0],
            (
                subtract[1],
                subtract[2],
                subtract[3] if len(subtract) > 3 else 0,
                subtract[4] if len(subtract) > 4 else None,  # seg_offsets
            ),
        )
        if subtract
        else (None, None)
    )

    # --- stage 2: partial build ------------------------------------------
    # Strategy pick (BuildConfig.strategy):
    #  * "partition" (zero-shuffle, default): every task accumulates sparse
    #    hash partials for every key over the documents it already holds —
    #    corpus never moves, no skew concern, no sizing pre-scan (slices
    #    self-size at reduce time from exact counts).
    #  * "bucketed" (salted shuffle): high-cardinality/huge filter sets —
    #    docs shuffle to (key, salt-bucket) groups so each task holds ONE
    #    bitmap; salting defuses zipf-skewed keys.  Needs the sizing
    #    pre-pass (dense partials require m upfront).
    # "auto" picks by estimated total bitmap size: from the pinned sizing
    # when given, else a metadata-only file-size estimate (the reference's
    # own -n/file-size sizing estimate, BloomFilterGenerator.h:108-141 /
    # Options -n) — never a corpus scan.
    strategy = build.strategy
    if strategy == "auto":
        if pinned is not None:
            total_bits = sum(meta["m_bits"] for meta in pinned.values())
        else:
            total_bits = _estimate_total_bits(docs, params)
        strategy = (
            "partition"
            if total_bits is None or total_bits <= build.partition_strategy_max_bits
            else "bucketed"
        )
    if strategy == "bucketed":
        sizing = pinned or size_filters(docs, key_col, text_col, params)
        if not sizing:
            return spark.createDataFrame([], REGISTRY_SCHEMA)

    # resume is only safe against the SAME input snapshot: partition ids /
    # doc membership shift when the file listing changes, silently dropping
    # or double-counting data.  Fingerprint the scan's file listing; on
    # mismatch (or unknowable, e.g. in-memory test DataFrames with no files)
    # discard stale partials and rebuild from scratch.
    # ``snapshot_id`` lets callers with a stable non-file input identity
    # (e.g. an Iceberg snapshot id) opt into resume explicitly.
    # The fingerprint covers every parameter that shapes partial CONTENT or
    # partition identity — not just the input listing: resuming with a
    # different coalesce_input (different partition ids), key/text column,
    # sizing, subtract filter, or hash family against same-listing partials
    # would silently drop or mis-hash data (build_mibf_store fingerprints
    # its params for the same reason).
    snap = snapshot_id or ";".join(sorted(docs.inputFiles()))
    param_fp = repr((
        key_col, text_col, params, build,
        sorted(keys) if keys is not None else None,
        sorted(expected_sizing.items()) if expected_sizing else None,
        (hashlib.md5(sub_bits).hexdigest(), sub_meta) if sub_bits is not None else None,
    ))
    snap_fp = (
        hashlib.md5((snap + "|" + param_fp).encode()).hexdigest() if snap else None
    )
    resume = False
    if partials_path and os.path.exists(partials_path):
        resume = snap_fp is not None and _read_snapshot(partials_path) == snap_fp
        if resume:
            # a checkpoint from an older engine version (pre-segmentation
            # schema) is stale state, not resumable state — rebuild
            try:
                have_cols = set(spark.read.parquet(partials_path).columns)
            except Exception:
                have_cols = set()
            resume = {f.name for f in PARTIAL_SCHEMA.fields} <= have_cols

    if strategy == "partition":
        base = docs.select(
            F.col(key_col).cast("string").alias("filter_id"),
            F.col(text_col).alias(text_col),
        )
        if build.coalesce_input:
            base = base.coalesce(build.coalesce_input)
        done_buckets: frozenset = frozenset()
        if resume:
            done_buckets = frozenset(
                int(r["bucket"])
                for r in spark.read.parquet(partials_path).select("bucket").distinct().collect()
            )
        # same snapshot → same listing → deterministic partition ids;
        # recompute only missing partitions.  The skip lives inside the
        # Arrow kernel (TaskContext) so a resumed build keeps the
        # vectorized scan — the old rdd.mapPartitionsWithIndex filter
        # pickled every surviving row through a Python RDD round-trip.
        part_fn = _build_partition_fn(
            params, build, text_col, "filter_id", sub_bits, sub_meta,
            skip_buckets=done_buckets or None,
        )
        new_partials = base.mapInPandas(part_fn, schema=PARTIAL_SCHEMA)
    else:
        bucketed = docs.select(
            F.col(key_col).cast("string").alias("filter_id"),
            F.col(text_col).alias(text_col),
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(build.num_buckets))
            .cast("int")
            .alias("bucket"),
        )
        todo = bucketed
        if resume:
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
        mode = "append" if resume else "overwrite"
        new_partials.write.mode(mode).parquet(partials_path)
        if snap_fp is not None:
            _write_snapshot(partials_path, snap_fp)
        partials = spark.read.parquet(partials_path)
        # one lineage row per (filter, source partition): the companion
        # rows carry the per-partition counters exactly once
        lineage = partials.filter(F.col("seg") == -1).select(
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

    # --- stage 3: merge ---------------------------------------------------
    if strategy == "partition":
        # segmented merge: one reducer per (filter, hash-prefix slice) —
        # merge parallelism is filters x S, each task a small sorted-set
        # union + one sequential slice scatter; the per-filter assembly is
        # memcpy + stats.  The old shape (one reducer per filter doing a
        # 10^7-hash sort + random scatter) was the build's non-scaling
        # bottleneck (BENCH.md round-2 profile).
        reduced = partials.groupBy("filter_id", "seg").applyInPandas(
            _seg_reduce_fn(params, build, pinned, PARTIAL_SCHEMA), schema=PARTIAL_SCHEMA
        )
        registry = reduced.groupBy("filter_id").applyInPandas(
            _assemble_fn(params, build, pinned), schema=REGISTRY_SCHEMA
        )
    else:
        # bucketed: two-level merge.  Level 1 bounds the final fan-in (no
        # single-reducer hotspot at large bucket counts); skipped when the
        # partial count is already small.
        g = max(1, build.merge_groups)
        if partials_path is None and build.num_buckets <= max(32, 2 * g):
            merge_in = partials
        else:
            merge_in = (
                partials.withColumn("bucket", F.pmod(F.col("bucket"), F.lit(g)).cast("int"))
                .groupBy("filter_id", "bucket")
                .applyInPandas(_merge_partials_fn(sizing, PARTIAL_SCHEMA, False, params), schema=PARTIAL_SCHEMA)
            )
        registry = merge_in.groupBy("filter_id").applyInPandas(
            _merge_partials_fn(sizing, REGISTRY_SCHEMA, True, params), schema=REGISTRY_SCHEMA
        )

    if registry_path:
        registry.write.mode("overwrite").parquet(registry_path)
        registry = spark.read.parquet(registry_path)
    return registry


#: registry columns that must agree for two builds of the same filter_id
#: to be OR-mergeable (same probe layout = same bit positions)
_MERGE_COMPAT_COLS = (
    "layout_version", "m_bits", "num_hashes", "block_bits", "shingle_w",
    "canonical", "hash_family", "seg_offsets",
)


def _merge_registry_fn():
    """applyInPandas kernel: OR-merge all registry rows of one filter_id
    (from k unioned registries) into one row."""

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in REGISTRY_SCHEMA.fields]
        if len(pdf) == 1:
            return pdf[cols]
        fid = str(key[0])
        first = pdf.iloc[0]
        for col in _MERGE_COMPAT_COLS:
            vals = {
                bytes(v) if isinstance(v, (bytes, bytearray, memoryview)) else v
                for v in pdf[col]
            }
            if len(vals) > 1:
                raise ValueError(
                    f"registry rows for {fid!r} disagree on {col} "
                    f"({sorted(map(str, vals))[:4]}) — filters built with "
                    "different probe layouts cannot be OR-merged; rebuild "
                    "with pinned expected_sizing"
                )
        m, h = int(first["m_bits"]), int(first["num_hashes"])
        bb = int(first["block_bits"])
        bits = np.zeros(m // 8, dtype=np.uint8)
        hll = HLLSketch(p=_HLL_P)
        cms = CountMinSketch(width=_CMS_W, depth=_CMS_D)
        td = TDigestSketch()
        kll = KLLSketch()
        n_docs = n_ins = sum_entries = max_entries = 0
        for _, row in pdf.iterrows():
            bits |= np.frombuffer(bytes(row["bitmap"]), dtype=np.uint8)
            n_docs += int(row["n_docs"])
            n_ins += int(row["n_inserted"])
            ne = int(row["num_entries"])
            sum_entries += ne
            max_entries = max(max_entries, ne)
            if row["hll"] is not None:
                hll = hll.merge(HLLSketch.deserialize(bytes(row["hll"]), p=_HLL_P))
            if row["cms"] is not None:
                cms = cms.merge(
                    CountMinSketch.deserialize(bytes(row["cms"]), _CMS_W, _CMS_D)
                )
            if row["tdigest"] is not None:
                td = td.merge(TDigestSketch.deserialize(bytes(row["tdigest"])))
            if row["kll"] is not None:
                kll = kll.merge(KLLSketch.deserialize(bytes(row["kll"])))
        so = first["seg_offsets"]
        seg_off = np.frombuffer(bytes(so), dtype=np.int64) if so is not None else None
        sk = BloomSketch(
            m_bits=m, num_hashes=h, bits=bits, block_bits=bb, seg_offsets=seg_off
        )
        # distinct entries across parts is not exactly knowable post-merge
        # (parts may share hashes): clamp the HLL estimate into its hard
        # bounds [max part, sum of parts]
        est = hll.estimate()
        num_entries = int(min(sum_entries, max(max_entries, round(est))))
        out = first.to_frame().T.copy()
        out["bitmap"] = [bits.tobytes()]
        out["n_docs"] = [n_docs]
        out["n_inserted"] = [n_ins]
        out["num_entries"] = [num_entries]
        out["redundant_entries"] = [n_ins - num_entries]
        out["approx_fpr"] = [approx_fpr(m, num_entries, h)]
        out["occupancy_fpr"] = [sk.fpr_from_occupancy()]
        out["distinct_frames_hll"] = [est]
        out["hll"] = [hll.serialize()]
        out["cms"] = [cms.serialize()]
        out["tdigest"] = [td.serialize()]
        out["kll"] = [kll.serialize()]
        return out[cols]

    return fn


def merge_registries(*registries: DataFrame) -> DataFrame:
    """OR-merge k filter registries into one (the incremental-build /
    cross-corpus union operator, and the micro-batch reducer behind
    ``streaming.build_stream``).

    Rows with the same ``filter_id`` merge associatively: bitmaps OR
    (Bloom union — the reference's filter-union semantics over identical
    (m, h) layouts), companion sketches (HLL/CMS/t-digest/KLL) merge by
    their own published merge rules, counters add.  Layout columns must
    agree per filter_id (build the parts with the same pinned
    ``expected_sizing``); a mismatch raises rather than silently probing
    wrong positions.  Filter ids present in only some registries pass
    through unchanged.

    Distributed: one union + one groupBy(filter_id) applyInPandas —
    bitmap-sized rows shuffle once, nothing gathers on the driver.
    """
    if not registries:
        raise ValueError("merge_registries needs at least one registry")
    uni = registries[0]
    for r in registries[1:]:
        uni = uni.unionByName(r)
    return uni.groupBy("filter_id").applyInPandas(
        _merge_registry_fn(), schema=REGISTRY_SCHEMA
    )


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
        lv = r.get("layout_version")
        if lv is not None and int(lv) != REGISTRY_LAYOUT_VERSION:
            raise ValueError(
                f"registry row '{fid}' has probe-layout version {lv}; this "
                f"engine probes layout {REGISTRY_LAYOUT_VERSION} — rebuild "
                "the filter (stale registries return wrong membership)"
            )
        if lv is None:
            # null OR absent: a schema-enforced read of an old registry
            # materializes the column as null, so keying on dict presence
            # would silently treat stale rows as current layout
            import warnings

            warnings.warn(
                f"registry row '{fid}' predates layout versioning; probe "
                "results are only valid if it was built by this engine "
                f"version (layout {REGISTRY_LAYOUT_VERSION})",
                stacklevel=2,
            )
        so = r.get("seg_offsets")
        out.append(
            {
                "filter_id": fid,
                "m_bits": int(r["m_bits"]),
                "num_hashes": int(r["num_hashes"]),
                "block_bits": int(r.get("block_bits", 0)),
                "shingle_w": int(r["shingle_w"]),
                "canonical": bool(r.get("canonical") or False),
                "hash_family": str(r.get("hash_family") or "poly"),
                "bitmap": bytes(r["bitmap"]),
                "seg_offsets": (
                    np.frombuffer(bytes(so), dtype=np.int64) if so is not None else None
                ),
                # per-filter FPR used by the binomial kernel
                "fpr": float(max(r["occupancy_fpr"], 1e-300)),
                "target_fpr": float(r["target_fpr"]),
            }
        )
    return out
