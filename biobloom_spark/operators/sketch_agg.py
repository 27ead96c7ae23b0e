"""Standalone mergeable sketch aggregation — the library surface.

The registry build (``maker.build_filters``) fuses HLL / count-min /
t-digest / KLL companions into every Bloom filter row.  This module
exposes the same four sketches as a *standalone* approximate-aggregation
API over any DataFrame, per the north rule's framing of the engine as a
distributed sketch library: per-key cardinality (HLL over token or
shingle hashes), token frequency (count-min), and document-length
quantiles (KLL + t-digest), all built as mergeable partials.

Shape (the UDAF pattern used everywhere in this engine):

1. ``mapInPandas`` partials — each Arrow batch groups by key locally and
   emits one sketch-row per (batch, key).  Zero shuffle; the corpus is
   read once and never leaves its partitions.
2. ``groupBy(key).applyInPandas`` merge — only sketch-sized rows ride the
   single shuffle (HLL 2^p registers, CMS w*d counters, KLL/TD compactor
   state: KBs per key against a corpus of any size).

Merges are the sketches' own published rules (register max, counter add,
compactor concat, centroid merge), so the result is independent of
partitioning — exactly (bit-identical) for HLL/CMS, within the published
error bound for the order-sensitive quantile sketches
(``tests/test_sketch_properties.py`` pins both contracts; the end-to-end
partition-invariance test here pins the DataFrame-level equivalent).

No bcgsc/biobloom counterpart (its only aggregate is the filter itself);
this is the Spark-native generalization the task mandate names.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "SKETCH_ROW_SCHEMA",
    "sketch_by_key",
    "merge_sketch_rows",
    "sketch_estimates",
    "cms_token_counts",
    "sketch_bounds_report",
]

SKETCH_ROW_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("hll", T.BinaryType(), False),
        T.StructField("cms", T.BinaryType(), False),
        T.StructField("kll", T.BinaryType(), False),
        T.StructField("tdigest", T.BinaryType(), False),
    ]
)

_COLS = [f.name for f in SKETCH_ROW_SCHEMA.fields]


def _sketch_params():
    # single source of truth: the registry companions' parameters
    from .maker import _CMS_D, _CMS_W, _HLL_P

    return _HLL_P, _CMS_W, _CMS_D


def _new(p, w, d):
    from ..sketch import CountMinSketch, HLLSketch, KLLSketch, TDigestSketch

    return HLLSketch(p=p), CountMinSketch(width=w, depth=d), KLLSketch(), TDigestSketch()


def sketch_by_key(
    docs: DataFrame,
    key_col: str = "lang",
    text_col: str = "text",
    distinct: str = "tokens",
    shingle_w: int = 3,
) -> DataFrame:
    """One sketch-row per key: (key, n_docs, n_tokens, hll, cms, kll,
    tdigest).

    - ``hll``: distinct count of ``distinct`` = ``"tokens"`` (default) or
      ``"shingles"`` (w-token frames — the registry build's domain);
    - ``cms``: token frequencies (query with ``cms_token_counts``);
    - ``kll`` / ``tdigest``: document-length (token-count) quantiles;
    - ``n_docs`` / ``n_tokens``: exact counters (merge by addition).

    Null keys/texts are dropped (same contract as ``build_filters``).
    """
    if distinct not in ("tokens", "shingles"):
        raise ValueError("distinct must be 'tokens' or 'shingles'")
    from ..session import ensure_workers

    ensure_workers(docs.sparkSession)
    p, cw, cd = _sketch_params()
    from ..functions.text import batch_doc_shingles

    sel = docs.filter(
        F.col(key_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(key_col).cast("string").alias("__key"), F.col(text_col).alias("__text"))

    def partials(batches):
        cache: dict = {}
        for pdf in batches:
            for key, g in pdf.groupby("__key", sort=False):
                texts = g["__text"].to_numpy()
                frames, _offs, tok_h, tok_c = batch_doc_shingles(
                    texts, shingle_w, cache
                )
                hll, cms, kll, td = _new(p, cw, cd)
                hll.update_batch(frames if distinct == "shingles" else tok_h)
                cms.update_batch(tok_h)
                lens = tok_c.astype(np.float64)
                kll.update_batch(lens)
                td.update_batch(lens)
                yield pd.DataFrame(
                    {
                        "key": [str(key)],
                        "n_docs": [len(g)],
                        "n_tokens": [int(tok_c.sum())],
                        "hll": [hll.serialize()],
                        "cms": [cms.serialize()],
                        "kll": [kll.serialize()],
                        "tdigest": [td.serialize()],
                    }
                )

    part = sel.mapInPandas(partials, SKETCH_ROW_SCHEMA)
    return part.groupBy("key").applyInPandas(_merge_fn(), SKETCH_ROW_SCHEMA)


def _merge_fn():
    p, cw, cd = _sketch_params()

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..sketch import CountMinSketch, HLLSketch, KLLSketch, TDigestSketch

        if len(pdf) == 1:
            return pdf[_COLS]
        hll, cms, kll, td = _new(p, cw, cd)
        for _, r in pdf.iterrows():
            hll = hll.merge(HLLSketch.deserialize(bytes(r["hll"]), p=p))
            cms = cms.merge(CountMinSketch.deserialize(bytes(r["cms"]), cw, cd))
            kll = kll.merge(KLLSketch.deserialize(bytes(r["kll"])))
            td = td.merge(TDigestSketch.deserialize(bytes(r["tdigest"])))
        return pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_docs": [int(pdf["n_docs"].sum())],
                "n_tokens": [int(pdf["n_tokens"].sum())],
                "hll": [hll.serialize()],
                "cms": [cms.serialize()],
                "kll": [kll.serialize()],
                "tdigest": [td.serialize()],
            }
        )

    return fn


def merge_sketch_rows(*sketch_rows: DataFrame) -> DataFrame:
    """Fold k independently built ``sketch_by_key`` results into one
    (cross-corpus / incremental aggregation — the ``merge_registries``
    analog).  One union + one sketch-sized shuffle."""
    if not sketch_rows:
        raise ValueError("merge_sketch_rows needs at least one input")
    from ..session import ensure_workers

    ensure_workers(sketch_rows[0].sparkSession)
    uni = sketch_rows[0]
    for r in sketch_rows[1:]:
        uni = uni.unionByName(r)
    return uni.groupBy("key").applyInPandas(_merge_fn(), SKETCH_ROW_SCHEMA)


_EST_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("distinct_hll", T.DoubleType(), False),
        T.StructField("len_q_kll", T.ArrayType(T.DoubleType()), False),
        T.StructField("len_q_tdigest", T.ArrayType(T.DoubleType()), False),
    ]
)

_QS = (0.1, 0.25, 0.5, 0.75, 0.9)


def sketch_estimates(
    sketch_rows: DataFrame, quantiles: tuple = _QS
) -> DataFrame:
    """Decode sketch rows into estimates: HLL distinct count + KLL and
    t-digest length quantiles.  Runs where the rows live (mapInPandas) —
    the key space can be arbitrarily large."""
    from ..session import ensure_workers

    ensure_workers(sketch_rows.sparkSession)
    p, cw, cd = _sketch_params()
    qs = list(quantiles)

    def est(batches):
        from ..sketch import HLLSketch, KLLSketch, TDigestSketch

        for pdf in batches:
            out = {
                "key": pdf["key"],
                "n_docs": pdf["n_docs"],
                "n_tokens": pdf["n_tokens"],
                "distinct_hll": [
                    float(HLLSketch.deserialize(bytes(b), p=p).estimate())
                    for b in pdf["hll"]
                ],
                "len_q_kll": [
                    [float(KLLSketch.deserialize(bytes(b)).quantile(q)) for q in qs]
                    for b in pdf["kll"]
                ],
                "len_q_tdigest": [
                    [float(TDigestSketch.deserialize(bytes(b)).quantile(q)) for q in qs]
                    for b in pdf["tdigest"]
                ],
            }
            yield pd.DataFrame(out)

    return sketch_rows.mapInPandas(est, _EST_SCHEMA)


def cms_token_counts(sketch_rows: DataFrame, tokens: list[str]) -> DataFrame:
    """Estimated frequency of each queried token per key:
    (key, token, est_count).  The token list is driver-provided (a
    dashboard / vocabulary probe), hashed once and closed over."""
    from ..session import ensure_workers
    from ..sketch.hashing import hash_tokens

    ensure_workers(sketch_rows.sparkSession)

    p, cw, cd = _sketch_params()
    toks = list(tokens)
    hashes = np.asarray(hash_tokens(toks), dtype=np.uint64)
    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("token", T.StringType(), False),
            T.StructField("est_count", T.LongType(), False),
        ]
    )

    def q(batches):
        from ..sketch import CountMinSketch

        for pdf in batches:
            keys, out_toks, est = [], [], []
            for _, r in pdf.iterrows():
                cms = CountMinSketch.deserialize(bytes(r["cms"]), cw, cd)
                for t, e in zip(toks, cms.query_batch(hashes)):
                    keys.append(r["key"])
                    out_toks.append(t)
                    est.append(int(e))
            yield pd.DataFrame({"key": keys, "token": out_toks, "est_count": est})

    return sketch_rows.mapInPandas(q, schema)


def sketch_bounds_report(
    spark,
    docs: DataFrame,
    key_col: str = "lang",
    text_col: str = "text",
    top_tokens: int = 5,
) -> DataFrame:
    """Published-bound audit of a ``sketch_by_key`` result against exact
    Spark aggregates of the same corpus — the standalone-library analog of
    ``sketch_audit.sketch_error_report`` (same bounds, same tolerances;
    see that module's docstring for the citations).  Exact + boolean
    columns, so the gate oracle is exact counts plus ``true`` per cell.
    """
    import math

    from ..sketch import CountMinSketch, HLLSketch, KLLSketch, TDigestSketch
    from ..sketch.hashing import hash_tokens
    from ..sources.tables import tokens_col
    from .sketch_audit import _QS as AUDIT_QS
    from .sketch_audit import _rank_err

    p, cw, cd = _sketch_params()
    rows = {r["key"]: r for r in sketch_by_key(docs, key_col, text_col).collect()}

    base = docs.filter(
        F.col(key_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(key_col).cast("string").alias("key"), tokens_col(text_col).alias("toks"))
    exact_distinct = {
        r["key"]: int(r["d"])
        for r in base.select("key", F.explode("toks").alias("t"))
        .groupBy("key")
        .agg(F.countDistinct("t").alias("d"))
        .collect()
    }
    hists: dict[str, list[tuple[float, int]]] = {}
    for r in (
        base.select("key", F.size("toks").alias("n")).groupBy("key", "n").count().collect()
    ):
        hists.setdefault(r["key"], []).append((float(r["n"]), int(r["count"])))
    from pyspark.sql import Window

    tok = base.select("key", F.explode("toks").alias("token"))
    wnd = Window.partitionBy("key").orderBy(F.desc("cnt"), F.asc("token"))
    top_by_key: dict[str, list[tuple[str, int]]] = {}
    for r in (
        tok.groupBy("key", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(wnd))
        .filter(F.col("rk") <= top_tokens)
        .collect()
    ):
        top_by_key.setdefault(r["key"], []).append((r["token"], int(r["cnt"])))

    hll_tol = 3 * 1.04 / math.sqrt(2**p)
    cms_eps = math.e / cw
    td_tol = 2.0 / 200.0
    out = []
    for key in sorted(rows):
        r = rows[key]
        hll = HLLSketch.deserialize(bytes(r["hll"]), p=p)
        cms = CountMinSketch.deserialize(bytes(r["cms"]), cw, cd)
        kll = KLLSketch.deserialize(bytes(r["kll"]))
        td = TDigestSketch.deserialize(bytes(r["tdigest"]))
        exact_d = exact_distinct.get(key, 0)
        hll_ok = abs(hll.estimate() - exact_d) <= hll_tol * max(exact_d, 1)
        hist = hists.get(key, [(0.0, 1)])
        kll_ok = max(_rank_err(hist, kll.quantile(q), q) for q in AUDIT_QS) <= kll.error_bound()
        td_ok = max(_rank_err(hist, td.quantile(q), q) for q in AUDIT_QS) <= td_tol
        cms_ok = True
        n_tok = max(int(r["n_tokens"]), 1)
        pairs = top_by_key.get(key, [])
        if pairs:
            ests = cms.query_batch(
                np.asarray(hash_tokens([t for t, _ in pairs]), dtype=np.uint64)
            )
            for (_t, true_c), e in zip(pairs, ests):
                if e < true_c or (float(e) - true_c) / n_tok > cms_eps:
                    cms_ok = False
        out.append(
            (key, int(r["n_docs"]), int(r["n_tokens"]), int(exact_d),
             bool(hll_ok), bool(cms_ok), bool(kll_ok), bool(td_ok))
        )
    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("n_docs", T.LongType(), False),
            T.StructField("n_tokens", T.LongType(), False),
            T.StructField("distinct_tokens", T.LongType(), False),
            T.StructField("hll_ok", T.BooleanType(), False),
            T.StructField("cms_ok", T.BooleanType(), False),
            T.StructField("kll_ok", T.BooleanType(), False),
            T.StructField("tdigest_ok", T.BooleanType(), False),
        ]
    )
    return spark.createDataFrame(out, schema)
