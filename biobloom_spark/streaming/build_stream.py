"""Structured Streaming incremental filter build.

The reference builds filters in one batch pass over fixed input files
(BioBloomMaker).  A crawl pipeline instead sees pages *arrive*; because
the engine's filters and companion sketches are mergeable UDAF state
(bitmap OR + HLL/CMS/t-digest/KLL merges), the build extends to a stream
for free: each micro-batch builds a normal batch registry over its pages
with pinned (m, h) sizing, then ``maker.merge_registries`` folds it into
the running registry — associativity makes the result independent of how
the stream was chopped into batches (property-tested against the
one-shot batch build).

Registry persistence is versioned: batch N writes
``<registry_path>/v=<N>`` and flips an atomically-renamed ``_LATEST``
pointer.  Replayed batches (restart from the streaming checkpoint) are
detected by their committed version directory and skipped, so the fold
is exactly-once; a kill mid-write leaves no ``_SUCCESS`` marker and the
batch re-runs — the same crash contract as the miBF store stages.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..config import BloomParams, BuildConfig

__all__ = ["build_stream_writer", "load_latest_registry", "latest_version"]

_LATEST = "_LATEST"


def _latest_path(registry_path: str) -> str:
    return os.path.join(registry_path, _LATEST)


def latest_version(registry_path: str) -> int | None:
    """Committed registry version (micro-batch id), or None before the
    first commit."""
    try:
        with open(_latest_path(registry_path)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _set_latest(registry_path: str, version: int) -> None:
    tmp = _latest_path(registry_path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _latest_path(registry_path))  # atomic pointer flip


def load_latest_registry(spark: SparkSession, registry_path: str) -> DataFrame | None:
    """The current merged registry DataFrame, or None before any commit."""
    v = latest_version(registry_path)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(registry_path, f"v={v}"))


def build_stream_writer(
    spark: SparkSession,
    stream_docs: DataFrame,
    sizing: dict,
    registry_path: str,
    key_col: str = "lang",
    text_col: str = "text",
    id_col: str = "url",
    params: BloomParams | None = None,
    build: BuildConfig | None = None,
):
    """foreachBatch writer that folds micro-batches into a persistent
    registry.  Returns a ``DataStreamWriter`` — caller sets trigger +
    checkpointLocation and ``.start()``s it.

    ``sizing`` pins (m, h) per filter key (a ``maker.size_filters`` result
    over a representative sample, or explicit expected-entry counts):
    identical probe layouts across batches are what make the bitmaps
    OR-mergeable.  Batch pages whose key is outside ``sizing`` are
    dropped (count them upstream if that matters); sizing from a sample
    only under-sizes the filter's FPR, never its correctness (no false
    negatives regardless).
    """
    from ..operators.maker import build_filters, merge_registries
    from ..operators.mibf_store import _stage_done

    if not stream_docs.isStreaming:
        raise ValueError("build_stream_writer expects a streaming DataFrame")
    os.makedirs(registry_path, exist_ok=True)
    keys = list(sizing)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        vdir = os.path.join(registry_path, f"v={batch_id}")
        if _stage_done(spark, vdir):
            # checkpoint replay after a crash between commit and pointer
            # flip: the fold already happened — just repair the pointer
            prev = latest_version(registry_path)
            if prev is None or prev < batch_id:
                _set_latest(registry_path, batch_id)
            return
        batch_reg = build_filters(
            spark,
            batch_df,
            key_col=key_col,
            text_col=text_col,
            id_col=id_col,
            params=params,
            build=build,
            keys=keys,
            expected_sizing=sizing,
        )
        prev = load_latest_registry(spark, registry_path)
        merged = merge_registries(prev, batch_reg) if prev is not None else batch_reg
        merged.write.mode("overwrite").parquet(vdir)
        _set_latest(registry_path, batch_id)

    return stream_docs.writeStream.foreachBatch(fold)
