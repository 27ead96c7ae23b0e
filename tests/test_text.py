"""Text layer tests: extractor byte-identity, tokenizer/shingle semantics,
DUST-analog mask, and the synthetic corpus determinism."""

from __future__ import annotations

import hashlib

import numpy as np

from biobloom_spark.corpus import generate_corpus_pandas
from biobloom_spark.functions.text import (
    doc_shingle_hashes,
    dust_mask,
    extract_text,
    frame_count,
    tokenize,
)


class TestExtractor:
    def test_strips_script_style_comments_tags(self):
        html = (
            b"<html><head><script>var x=1;</script><style>.a{}</style></head>"
            b"<body><!-- hidden --><p>hello &amp; goodbye</p></body></html>"
        )
        assert extract_text(html) == "hello & goodbye"

    def test_deterministic_byte_identity(self):
        # the input_hint invariant: stable extracted text per url
        pdf = generate_corpus_pandas(50, seed=7)
        digests1 = [hashlib.sha256(extract_text(h).encode()).hexdigest() for h in pdf["html"]]
        digests2 = [hashlib.sha256(extract_text(h).encode()).hexdigest() for h in pdf["html"]]
        assert digests1 == digests2

    def test_extract_recovers_generated_text(self):
        # corpus html wraps text with boilerplate; extractor must recover it
        pdf = generate_corpus_pandas(20, seed=3)
        for html, text, url in zip(pdf["html"], pdf["text"], pdf["url"]):
            extracted = extract_text(bytes(html))
            assert text in extracted, url
            assert "var x=" not in extracted  # script stripped

    def test_none_and_bad_utf8(self):
        assert extract_text(None) == ""
        assert isinstance(extract_text(b"<p>\xff\xfe</p>"), str)


class TestTokenizeShingle:
    def test_tokenize_matches_sql_split_semantics(self):
        assert tokenize("a b  c\t d ") == ["a", "b", "c", "d"]
        assert tokenize("") == []

    def test_frame_count(self):
        assert frame_count(10, 3) == 8
        assert frame_count(2, 3) == 0

    def test_doc_shingles_deterministic(self):
        a = doc_shingle_hashes("the quick brown fox jumps", 3)
        b = doc_shingle_hashes("the quick brown fox jumps", 3)
        assert np.array_equal(a, b)
        assert a.size == 3

    def test_dust_mask_flags_repetition(self):
        toks = ["a", "a", "a", "b", "c", "d"]
        m = dust_mask(toks, 3)
        assert m[0]  # window (a,a,a) is pure repetition
        assert not m[2]  # (a,b,c) is fine
        assert m.size == 4


class TestCorpus:
    def test_generation_is_pure_function_of_seed_and_id(self):
        a = generate_corpus_pandas(30, seed=42)
        b = generate_corpus_pandas(30, seed=42)
        assert a.equals(b)
        c = generate_corpus_pandas(30, seed=43)
        assert not a["text"].equals(c["text"])

    def test_lang_zipf_skew(self):
        pdf = generate_corpus_pandas(2000, seed=42)
        counts = pdf["lang"].value_counts()
        assert counts.index[0] == "en"
        assert counts.iloc[0] > 3 * counts.iloc[-1]  # heavy head

    def test_cross_lang_token_sharing(self):
        pdf = generate_corpus_pandas(500, seed=42)
        en = set(" ".join(pdf[pdf.lang == "en"]["text"]).split())
        de = set(" ".join(pdf[pdf.lang == "de"]["text"]).split())
        shared = en & de
        assert shared and all(t.startswith("common") for t in shared)
        assert en - de  # and exclusive vocabulary exists
