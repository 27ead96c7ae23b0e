"""FASTA/FASTQ ingestion — reference-format parity source (S1/S2).

The reference streams FASTA/FASTQ(.gz) through the vendored kseq parser
(/root/reference/Common/kseq.h, used at
/root/reference/BioBloomCategorizer/BioBloomClassifier.cpp:58-70).  Here a
file set becomes a DataFrame ``(header, seq, qual, comment, path)`` — one
row per record — so every engine operator (maker, categorizer, dedup)
runs unchanged on sequence data with ``text_col="seq"`` and a
character-k-mer shingler.

Distribution shape: ``spark.read.format("binaryFile")`` lists and
partitions by *file* (the reference's -l file-list parallelism, S4,
/root/reference/BioBloomCategorizer/BioBloomCategorizer.cpp:482-500);
parsing is a mapInPandas over file blobs.  Fine for the many-small-files
layout genomics uses; a single multi-GB fasta should be split upstream
(standard practice) since record boundaries aren't line-aligned.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_fasta", "FASTA_SCHEMA", "pair_reads"]

FASTA_SCHEMA = T.StructType(
    [
        T.StructField("header", T.StringType(), False),
        T.StructField("seq", T.StringType(), False),
        T.StructField("qual", T.StringType(), True),
        T.StructField("comment", T.StringType(), True),
        T.StructField("path", T.StringType(), False),
    ]
)


def _parse_records(data: bytes, path: str):
    """kseq-equivalent record iterator over FASTA or FASTQ bytes."""
    if path.endswith(".gz"):
        data = gzip.decompress(data)
    text = io.StringIO(data.decode("utf-8", "replace"))
    header = None
    seq_lines: list[str] = []
    first = text.read(1)
    text.seek(0)
    if first == "@":  # FASTQ: strict 4-line records
        while True:
            h = text.readline()
            if not h:
                return
            s = text.readline().strip()
            text.readline()  # '+'
            q = text.readline().strip()
            name, _, comment = h[1:].strip().partition(" ")
            yield name, s, q or None, comment or None, path
    else:  # FASTA: '>' headers, multi-line sequences
        for line in text:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if header is not None:
                    name, _, comment = header.partition(" ")
                    yield name, "".join(seq_lines), None, comment or None, path
                header = line[1:]
                seq_lines = []
            elif line:
                seq_lines.append(line.strip())
        if header is not None:
            name, _, comment = header.partition(" ")
            yield name, "".join(seq_lines), None, comment or None, path


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Read FASTA/FASTQ(.gz) file(s) (glob ok) → record DataFrame."""
    from ..session import ensure_workers

    ensure_workers(spark)
    blobs = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_records(bytes(content), p))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["header", "seq", "qual", "comment", "path"]
                )

    return blobs.mapInPandas(parse, schema=FASTA_SCHEMA)


def seq_to_char_tokens(df: DataFrame, seq_col: str = "seq", out_col: str = "text") -> DataFrame:
    """Space-join the sequence's characters so the engine's w-token
    shingler computes true character k-mers (w = k): the exact frame
    semantics of the reference's ntHashIterator window over bases.
    JVM-side (split + concat_ws); upper-cased like the reference's
    ambiguity-tolerant readers."""
    from pyspark.sql import functions as F

    chars = F.split(F.upper(F.col(seq_col)), "")  # java split drops trailing empties
    return df.withColumn(out_col, F.concat_ws(" ", chars))


def pair_reads(reads: DataFrame, header_col: str = "header") -> DataFrame:
    """'Smart pair' matching (S3): mate1/mate2 joined on header prefix.

    The reference buffers unpaired reads in an in-memory map
    (/root/reference/BioBloomCategorizer/BioBloomClassifier.cpp:464-564);
    in batch this is a groupBy on the header with the /1 /2 suffix
    stripped — output (pair_key, text1, text2)."""
    from pyspark.sql import functions as F

    key = F.regexp_replace(F.col(header_col), r"/[12]$", "")
    mate = F.when(F.col(header_col).endswith("/2"), 2).otherwise(1)
    tagged = reads.withColumn("pair_key", key).withColumn("mate", mate)
    return (
        tagged.groupBy("pair_key")
        .agg(
            F.max(F.when(F.col("mate") == 1, F.col("seq"))).alias("text1"),
            F.max(F.when(F.col("mate") == 2, F.col("seq"))).alias("text2"),
        )
    )
