"""Deterministic synthetic web corpus in the BASELINE input_hint shape:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Everything is a pure function of (seed, doc_id) — generation is
partition-order independent, so the same (seed, n) always yields the same
table regardless of parallelism: the property the byte-identity and
resume tests rely on.  Domains and languages are zipfian (the skew stress
the salted build must survive); per-language vocabularies share a
controlled fraction of tokens to create true/false-positive geometry
(mirroring cross-species shared k-mer content,
/root/reference/README.md:338-342).
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LANGS = ("en", "de", "fr", "es", "zh", "pt", "it", "nl")
_EPOCH = dt.datetime(2024, 11, 1, tzinfo=dt.timezone.utc)

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def _vocab(lang: str, size: int, shared: int, shared_frac: float) -> np.ndarray:
    """Per-language token vocabulary: ``shared_frac`` of draws come from a
    global shared pool, the rest from lang-exclusive tokens."""
    own = np.array([f"{lang}tok{i}" for i in range(size)])
    pool = np.array([f"common{i}" for i in range(shared)])
    n_pool = int(size * shared_frac / max(1e-9, 1 - shared_frac))
    reps = np.resize(pool, max(1, n_pool)) if shared else np.empty(0, dtype=own.dtype)
    return np.concatenate([own, reps])


def _gen_batch(ids: np.ndarray, seed: int, langs, vocabs, mean_tokens: int) -> pd.DataFrame:
    n = ids.size
    urls, texts, htmls, langs_out, ts = [], [], [], [], []
    lang_ranks = np.arange(1, len(langs) + 1, dtype=np.float64)
    lang_probs = (1.0 / lang_ranks) / (1.0 / lang_ranks).sum()  # zipf s=1
    for did in ids:
        rng = np.random.default_rng((seed << 20) ^ int(did))
        lang = langs[rng.choice(len(langs), p=lang_probs)]
        vocab = vocabs[lang]
        n_tok = max(4, int(rng.poisson(mean_tokens)))
        toks = vocab[rng.integers(0, len(vocab), n_tok)]
        text = " ".join(toks.tolist())
        domain = f"site{int(rng.zipf(1.4)) % 1000}.example"
        url = f"https://{domain}/{lang}/page{int(did)}"
        html = (
            f"<html><head><title>p{int(did)}</title>"
            f"<script>var x={int(did)};</script>"
            f"<style>.a{{color:red}}</style></head>"
            f"<body><!-- c --><h1>p{int(did)}</h1><p>{text}</p></body></html>"
        ).encode()
        urls.append(url)
        texts.append(text)
        htmls.append(html)
        langs_out.append(lang)
        ts.append(_EPOCH + dt.timedelta(seconds=int(rng.integers(0, 30 * 86400))))
    return pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": htmls, "text": texts, "lang": langs_out}
    )


def generate_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    langs=LANGS,
    vocab_size: int = 400,
    shared_tokens: int = 120,
    shared_frac: float = 0.25,
    mean_tokens: int = 120,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` pages."""
    from .session import ensure_workers

    ensure_workers(spark)
    vocabs = {l: _vocab(l, vocab_size, shared_tokens, shared_frac) for l in langs}
    langs = tuple(langs)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy(), seed, langs, vocabs, mean_tokens)

    base = spark.range(n_docs, numPartitions=num_partitions)
    return base.mapInPandas(gen, schema=CORPUS_SCHEMA)


def generate_corpus_pandas(n_docs: int, seed: int = 42, **kw) -> pd.DataFrame:
    """Driver-side twin of generate_corpus for Spark-free unit tests —
    identical output by construction (same per-id pure function)."""
    langs = tuple(kw.get("langs", LANGS))
    vocabs = {
        l: _vocab(
            l,
            kw.get("vocab_size", 400),
            kw.get("shared_tokens", 120),
            kw.get("shared_frac", 0.25),
        )
        for l in langs
    }
    return _gen_batch(np.arange(n_docs), seed, langs, vocabs, kw.get("mean_tokens", 120))
