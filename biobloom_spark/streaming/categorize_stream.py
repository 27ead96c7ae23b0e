"""Structured Streaming categorization.

The reference is a batch tool over file streams (SURVEY.md §2.10 — no
watermarks/state), so batch parity needs nothing here; this module is the
continuous-ingest extension a web-crawl pipeline wants: pages arrive as
files (or Kafka), each micro-batch is scored against the broadcast filter
registry with the *same* zero-shuffle Arrow pass as the batch categorizer,
and results stream out partitioned by assignment (the demultiplexed sink)
— classification is stateless, so no watermark is needed; exactly-once
comes from the sink/checkpoint contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import CategorizerConfig

__all__ = ["categorize_stream", "stream_from_parquet_dir"]


def categorize_stream(
    spark: SparkSession,
    stream: DataFrame,
    filters: list[dict],
    cfg: CategorizerConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming DataFrame → streaming classification results.

    Identical output schema and semantics to ``operators.categorize`` —
    mapInPandas is stateless, so the same scoring closure runs per
    micro-batch unchanged."""
    from ..operators.categorizer import categorize

    if not stream.isStreaming:
        raise ValueError("categorize_stream expects a streaming DataFrame")
    return categorize(spark, stream, filters, cfg, id_col=id_col, text_col=text_col)


def stream_from_parquet_dir(
    spark: SparkSession, path: str, schema=None, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream over a parquet directory (the crawl-drop layout)."""
    reader = spark.readStream.format("parquet").option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        static = spark.read.parquet(path)
        reader = reader.schema(static.schema)
    return reader.load(path)


def classify_mibf_stream(
    spark: SparkSession,
    stream: DataFrame,
    sketch,
    alpha: float = 1e-10,
    multi_thresh: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming miBF classification — same stateless broadcast pass as
    ``operators.mibf.classify_mibf``, per micro-batch."""
    from ..operators.mibf import classify_mibf

    if not stream.isStreaming:
        raise ValueError("classify_mibf_stream expects a streaming DataFrame")
    return classify_mibf(
        spark, stream, sketch, alpha=alpha, multi_thresh=multi_thresh,
        id_col=id_col, text_col=text_col,
    )


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming exact-dedup: keep the first arrival of each
    content hash within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` on the content hash is Spark's
    built-in keyed state store (RocksDB-backed on a real cluster) with
    watermark-driven eviction: a hash's state is dropped once the watermark
    passes its arrival event time, so a 10^12-page crawl stream never
    accumulates unbounded hashes.  (Plain ``dropDuplicates`` on a non
    event-time subset would keep every key forever.)  Late duplicates
    beyond the horizon re-emerge — the standard bounded-state/completeness
    trade.
    """
    from pyspark.sql import functions as F

    if not stream.isStreaming:
        raise ValueError("dedup_stream expects a streaming DataFrame")
    return (
        stream.withColumn("__h", F.xxhash64(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__h"])
        .drop("__h")
    )
