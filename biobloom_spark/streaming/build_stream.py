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
``<registry_path>/v=<N>``; the "latest" registry is the highest version
directory carrying the parquet committer's ``_SUCCESS`` marker — derived
by listing through the Hadoop FileSystem API (works for any configured
FS: file://, hdfs://, s3a://…; a driver restart on another host sees the
same state).  Replayed batches (restart from the streaming checkpoint)
are detected by their committed version directory and skipped, so the
fold is exactly-once; a kill mid-write leaves no ``_SUCCESS`` marker and
the batch re-runs (``mode="overwrite"`` clobbers the partial output) —
the same crash contract as the miBF store stages.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession

from ..config import BloomParams, BuildConfig

__all__ = ["build_stream_writer", "load_latest_registry", "latest_version"]


def latest_version(spark: SparkSession, registry_path: str) -> int | None:
    """Highest committed registry version (micro-batch id), or None before
    the first commit.  A version counts as committed only when its
    ``_SUCCESS`` marker exists — partial output from a killed write is
    invisible here."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(registry_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    best: int | None = None
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith("v=")):
            continue
        try:
            v = int(name[2:])
        except ValueError:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(status.getPath(), "_SUCCESS")
        if fs.exists(marker) and (best is None or v > best):
            best = v
    return best


def load_latest_registry(spark: SparkSession, registry_path: str) -> DataFrame | None:
    """The current merged registry DataFrame, or None before any commit."""
    v = latest_version(spark, registry_path)
    if v is None:
        return None
    return spark.read.parquet(posixpath.join(registry_path, f"v={v}"))


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
    keys = list(sizing)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        vdir = posixpath.join(registry_path, f"v={batch_id}")
        if _stage_done(spark, vdir):
            # checkpoint replay after a crash between commit and the
            # trigger advancing: the fold already happened — nothing to do
            # (the committed directory IS the pointer)
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

    return stream_docs.writeStream.foreachBatch(fold)
