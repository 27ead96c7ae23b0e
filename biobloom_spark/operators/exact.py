"""Exact set-membership classification — the categorizer's join-based twin.

Same query semantics as the Bloom categorizer (hit fraction of a document's
frames against each reference frame-set, threshold, unique/multi/no
assignment — SURVEY.md §2.9 STD mode) but computed *exactly* with
relational operators: shingle explode → distinct reference sets →
equi-join → per-(doc, filter) hit counts.

Three roles:
1. the DuckDB-oracle-checkable query surface (every step is ANSI SQL);
2. the exact oracle the Bloom path is differential-tested against
   (Bloom adds only false positives, bounded by FPR);
3. a legitimate distributed operator in its own right when exactness
   matters more than memory (shuffle-heavy: docs explode ~frames×,
   vs. the Bloom path's zero-shuffle broadcast probe — the scale
   trade-off documented in SURVEY.md §2.3-J1).

All shingling is JVM-side (split/transform/slice/concat_ws) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MULTI_MATCH, NO_MATCH

__all__ = ["shingle_frames", "exact_classify", "exact_classify_summary"]


def _tokens(text_col: str):
    from ..sources.tables import tokens_col

    return tokens_col(text_col)


def shingle_frames(docs: DataFrame, text_col: str = "text", w: int = 3) -> DataFrame:
    """Explode every doc into its w-token shingle frames (JVM-side).

    Output: input columns + ``shingle``.  Frame count per doc =
    ``greatest(0, n_tokens - w + 1)`` — identical to the sizing pre-pass
    and the Arrow path's ``shingle_hashes``.
    """
    d = docs.withColumn("__toks", _tokens(text_col))
    n_frames = F.greatest(F.lit(0), F.size("__toks") - F.lit(w - 1))
    idx = F.when(n_frames > 0, F.sequence(F.lit(1), n_frames)).otherwise(
        F.array().cast("array<int>")
    )
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("__toks", i, w)))
    return d.withColumn("shingle", F.explode(shingles)).drop("__toks")


def exact_classify(
    docs: DataFrame,
    key_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    threshold: float = 0.5,
    broadcast_refs: bool = True,
) -> DataFrame:
    """Per-document exact classification: (id, assigned).

    A doc matches filter L iff ``|frames ∩ refset(L)| / frames >= threshold``
    where refset(L) = distinct shingles of all docs with key L (frame
    occurrences counted with multiplicity, mirroring the Bloom kernels'
    hit counting).  ``broadcast_refs`` broadcasts the distinct reference
    shingle set — right when refsets fit executors; disable for a shuffle
    hash join at larger reference corpora.
    """
    sh = shingle_frames(docs.select(id_col, key_col, text_col), text_col, w)
    refsets = sh.select(F.col(key_col).alias("ref_key"), "shingle").distinct()
    if broadcast_refs:
        refsets = F.broadcast(refsets)
    frames = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("frames"))
    hits = (
        sh.join(refsets, on="shingle")
        .groupBy(id_col, "ref_key")
        .agg(F.count(F.lit(1)).alias("hit_frames"))
    )
    scored = hits.join(frames, on=id_col).filter(
        F.col("hit_frames") >= F.lit(threshold) * F.col("frames")
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("nhits"), F.min("ref_key").alias("only")
    )
    assigned = (
        docs.select(id_col)
        .join(agg, on=id_col, how="left")
        .select(
            id_col,
            F.when(F.col("nhits").isNull(), F.lit(NO_MATCH))
            .when(F.col("nhits") == 1, F.col("only"))
            .otherwise(F.lit(MULTI_MATCH))
            .alias("assigned"),
        )
    )
    return assigned


def exact_classify_summary(
    docs: DataFrame,
    key_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Counts per assigned category — the summary-sink shape (A5)."""
    return (
        exact_classify(docs, key_col, id_col, text_col, w, threshold)
        .groupBy("assigned")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
