"""Structured Streaming categorization test: file-source micro-batches
through the scoring pass, results match the batch categorizer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biobloom_spark.config import BuildConfig
from biobloom_spark.corpus import generate_corpus
from biobloom_spark.operators.categorizer import categorize
from biobloom_spark.operators.maker import build_filters, load_registry
from biobloom_spark.streaming.categorize_stream import (
    categorize_stream,
    stream_from_parquet_dir,
)


def test_stream_matches_batch(spark, tmp_path):
    corpus = generate_corpus(
        spark, 200, seed=13, langs=("en", "de"), num_partitions=4
    ).cache()
    src = str(tmp_path / "drop")
    corpus.write.mode("overwrite").parquet(src)
    reg = build_filters(
        spark, corpus, id_col="url", build=BuildConfig(num_buckets=2, merge_groups=1)
    )
    filters = load_registry(reg)

    stream = stream_from_parquet_dir(spark, src, max_files_per_trigger=2)
    res_stream = categorize_stream(spark, stream, filters, id_col="url")
    out = str(tmp_path / "out")
    q = (
        res_stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(out)
    batch = categorize(spark, corpus, filters, id_col="url")
    assert streamed.count() == 200
    joined = streamed.alias("s").join(
        batch.alias("b"), on="url"
    ).filter(F.col("s.assigned") != F.col("b.assigned"))
    assert joined.count() == 0  # micro-batch == batch decisions


def test_stream_rejects_batch_df(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="streaming"):
        categorize_stream(spark, docs, [])
