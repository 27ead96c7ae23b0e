"""FASTA/FASTQ source tests — the reference-domain round trip:
fasta files → DataFrame → char-k-mer filters → categorize reads.

Mirrors the reference's system-test shape (simulated reads from two
genomes, classified back to their source,
/root/reference/Tests/SystemTests/systemTest.pl:36-120)."""

from __future__ import annotations

import gzip

import numpy as np
import pytest
from pyspark.sql import functions as F

from biobloom_spark.config import BloomParams, BuildConfig, ScoringConfig, CategorizerConfig
from biobloom_spark.operators.categorizer import categorize
from biobloom_spark.operators.maker import build_filters, load_registry
from biobloom_spark.sources.fasta import pair_reads, read_fasta, seq_to_char_tokens


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


@pytest.fixture(scope="module")
def fasta_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fa")
    rng = np.random.default_rng(5)
    genomes = {"ecoli": _genome(rng, 3000), "human": _genome(rng, 3000)}
    # multi-line fasta + gz fastq of simulated 100bp reads
    for name, g in genomes.items():
        with open(d / f"{name}.fasta", "w") as f:
            f.write(f">{name} chromosome 1\n")
            for i in range(0, len(g), 70):
                f.write(g[i : i + 70] + "\n")
    lines = []
    for i in range(100):
        src = "ecoli" if i % 2 == 0 else "human"
        start = int(rng.integers(0, 2900))
        read = genomes[src][start : start + 100]
        lines.append(f"@{src}_read{i}/1\n{read}\n+\n{'I' * 100}\n")
    with gzip.open(d / "reads.fq.gz", "wt") as f:
        f.writelines(lines)
    return str(d), genomes


class TestFastaSource:
    def test_fasta_roundtrip(self, spark, fasta_dir):
        d, genomes = fasta_dir
        refs = read_fasta(spark, f"{d}/*.fasta")
        rows = {r["header"]: r for r in refs.collect()}
        assert set(rows) == {"ecoli", "human"}
        assert rows["ecoli"]["seq"] == genomes["ecoli"]  # multi-line re-joined
        assert rows["ecoli"]["comment"] == "chromosome 1"
        assert rows["ecoli"]["qual"] is None

    def test_fastq_gz_roundtrip(self, spark, fasta_dir):
        d, _ = fasta_dir
        reads = read_fasta(spark, f"{d}/reads.fq.gz")
        assert reads.count() == 100
        r = reads.first()
        assert len(r["seq"]) == 100 and len(r["qual"]) == 100

    def test_char_kmer_classification(self, spark, fasta_dir):
        """build per-genome 25-mer filters → classify simulated reads →
        every read assigned to its source genome (the reference's
        accuracy check, util/CountHitsMisses.py:20-39 analog)."""
        d, _ = fasta_dir
        refs = seq_to_char_tokens(read_fasta(spark, f"{d}/*.fasta"))
        params = BloomParams(shingle_w=25)  # k=25, the reference default
        reg = build_filters(
            spark, refs, key_col="header", text_col="text", id_col="header",
            params=params, build=BuildConfig(num_buckets=2, merge_groups=1),
        )
        filters = load_registry(reg)
        reads = seq_to_char_tokens(read_fasta(spark, f"{d}/reads.fq.gz"))
        res = categorize(
            spark, reads, filters,
            CategorizerConfig(scoring=ScoringConfig(method="simple", threshold=0.15)),
            id_col="header", text_col="text",
        )
        joined = res.withColumn("truth", F.split("header", "_")[0])
        total = joined.count()
        correct = joined.filter(F.col("assigned") == F.col("truth")).count()
        assert correct == total  # disjoint random genomes → clean separation

    def test_pair_reads(self, spark):
        rows = [
            ("p1/1", "AAAA", None, None, "f"),
            ("p1/2", "CCCC", None, None, "f"),
            ("p2/1", "GGGG", None, None, "f"),
        ]
        df = spark.createDataFrame(
            rows, "header string, seq string, qual string, comment string, path string"
        )
        pairs = {r["pair_key"]: r for r in pair_reads(df).collect()}
        assert pairs["p1"]["text1"] == "AAAA" and pairs["p1"]["text2"] == "CCCC"
        assert pairs["p2"]["text2"] is None
