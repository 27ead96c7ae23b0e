"""Tests for the training-data pipeline operators: dedup, similarity,
text analysis, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from biobloom_spark.corpus import generate_corpus_pandas
from biobloom_spark.operators.dedup import (
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dups,
    simhash_signatures,
)
from biobloom_spark.operators.multimodal import (
    decode_media_meta,
    extract_features,
    sample_frames,
    synthesize_media,
)
from biobloom_spark.operators.similarity import (
    brute_force_topk,
    deterministic_centroids,
    ivf_assign,
    ivf_topk,
)
from biobloom_spark.operators.textstats import (
    doc_fingerprints,
    language_id,
    quality_score,
    repetition_stats,
    token_stats,
    train_language_profiles,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    """60 base docs + planted exact dup + planted near dup."""
    pdf = generate_corpus_pandas(60, seed=31, langs=("en", "de"), mean_tokens=60)
    texts = list(pdf["text"])
    texts.append(texts[0])  # exact dup of doc 0 → id 60
    toks = texts[1].split()
    toks[len(toks) // 2] = "MUTATED"
    texts.append(" ".join(toks))  # near dup of doc 1 → id 61
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).cache()


class TestDedup:
    def test_exact_dedup(self, spark, dup_docs):
        res = exact_dedup(dup_docs).cache()
        groups = res.groupBy("dup_group").count().filter(F.col("count") > 1).collect()
        assert len(groups) == 1
        canon = res.filter(~F.col("is_canonical")).collect()
        assert [r["doc_id"] for r in canon] == [60]

    def test_snapshot_dedup_keeps_newest_per_key(self, spark):
        from datetime import datetime

        from biobloom_spark.operators.dedup import snapshot_dedup

        rows = [
            # url A: three crawls, newest is id 3
            ("a", datetime(2024, 1, 1), 1, "old"),
            ("a", datetime(2024, 3, 1), 3, "new"),
            ("a", datetime(2024, 2, 1), 2, "mid"),
            # url B: exact ts tie → larger tiebreak id wins
            ("b", datetime(2024, 1, 1), 4, "tie-lo"),
            ("b", datetime(2024, 1, 1), 5, "tie-hi"),
            # url C: single row passes through
            ("c", datetime(2024, 5, 1), 6, "only"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, doc_id long, text string"
        )
        got = {
            r["url"]: (r["doc_id"], r["text"])
            for r in snapshot_dedup(df, "url", "warc_ts", "doc_id").collect()
        }
        assert got == {"a": (3, "new"), "b": (5, "tie-hi"), "c": (6, "only")}
        # schema passes every payload column through unchanged
        assert set(snapshot_dedup(df, "url", "warc_ts", "doc_id").columns) == set(df.columns)

    def test_ngram_jaccard_exact_pairs(self, spark, dup_docs):
        pairs = ngram_jaccard_pairs(dup_docs, threshold=0.5).collect()
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
        assert got[(0, 60)] == 1.0  # exact dup
        assert (1, 61) in got and got[(1, 61)] > 0.8  # near dup
        assert len(got) == 2

    def test_minhash_signature_deterministic(self, spark, dup_docs):
        s1 = {r["doc_id"]: r["signature"] for r in minhash_signatures(dup_docs).collect()}
        s2 = {r["doc_id"]: r["signature"] for r in minhash_signatures(dup_docs).collect()}
        assert s1 == s2
        assert s1[0] == s1[60]  # identical docs → identical signatures

    def test_minhash_lsh_finds_planted_dups(self, spark, dup_docs):
        pairs = minhash_lsh_pairs(dup_docs, threshold=0.7).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 60) in got
        assert (1, 61) in got

    def test_minhash_estimates_jaccard(self, spark, dup_docs):
        exact = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(dup_docs, threshold=0.5).collect()
        }
        est = {
            (r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in minhash_lsh_pairs(dup_docs, threshold=0.5).collect()
        }
        for pair, j in exact.items():
            assert pair in est
            assert abs(est[pair] - j) < 0.15  # 128 perms → ~0.09 std

    def test_simhash_near_dups(self, spark, dup_docs):
        sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(dup_docs).collect()}
        assert sigs[0] == sigs[60]
        ham = bin(sigs[1] ^ sigs[61]).count("1")
        assert ham <= 12  # 3 of ~60 shingles changed -> small but nonzero
        dups = simhash_near_dups(dup_docs, max_hamming=12, blocks=16).collect()
        got = {(r["id_a"], r["id_b"]) for r in dups}
        assert (0, 60) in got and (1, 61) in got

    def test_simhash_md5_signatures_match_reference_recompute(self, spark, dup_docs):
        """The JVM-expression md5 simhash (the oracle-checkable variant)
        equals an independent hashlib recompute of the Charikar sign-sum
        over md5 shingle hashes, bit for bit."""
        import hashlib

        from biobloom_spark.operators.dedup import simhash_signatures_sql

        def ref(text: str, w: int = 3) -> int:
            toks = text.split()
            votes = [0] * 64
            n = 0
            for i in range(len(toks) - w + 1):
                h = int(
                    hashlib.md5(" ".join(toks[i : i + w]).encode()).hexdigest()[:16], 16
                )
                for b in range(64):
                    votes[b] += 1 if (h >> b) & 1 else -1
                n += 1
            if n == 0:
                return 0
            return sum(1 << b for b in range(64) if votes[b] > 0)

        sigs = {
            r["doc_id"]: r["simhash"] & 0xFFFFFFFFFFFFFFFF
            for r in simhash_signatures_sql(dup_docs).collect()
        }
        texts = {r["doc_id"]: r["text"] for r in dup_docs.collect()}
        assert len(sigs) == len(texts)
        for did, t in texts.items():
            assert sigs[did] == ref(t), did

    def test_simhash_md5_near_dups_equal_brute_force(self, spark, dup_docs):
        """Pigeonhole blocking is lossless: the md5-variant bucket-join
        output equals the all-pairs Hamming-<=d set."""
        from biobloom_spark.operators.dedup import simhash_signatures_sql

        sigs = {
            r["doc_id"]: r["simhash"] & 0xFFFFFFFFFFFFFFFF
            for r in simhash_signatures_sql(dup_docs).collect()
        }
        ids = sorted(sigs)
        want = set()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                h = bin(sigs[a] ^ sigs[b]).count("1")
                if h <= 12:
                    want.add((a, b, h))
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_near_dups(
                dup_docs, max_hamming=12, blocks=16, hash_fn="md5"
            ).collect()
        }
        assert got == want

    def test_embedding_near_dups(self, spark, sf_dir):
        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # plant a duplicate vector
        first = embs.first()
        dup = spark.createDataFrame(
            [(99999, first["embedding"], first["label"])], embs.schema
        )
        res = embedding_near_dups(embs.union(dup), threshold=0.999).collect()
        got = {(r["id_a"], r["id_b"]) for r in res}
        assert (first["vec_id"], 99999) in got

    def test_embedding_near_dup_recall_vs_brute_force(self, spark):
        """Multi-table OR-amplified hyperplane LSH must recall >=0.95 of
        the true cosine>=0.95 pairs (analytic recall of the default P=10,
        L=12 config at s=0.95 is ~0.994; the single-table variant measured
        ~0.66 — the round-1 weak spot this replaces)."""
        rng = np.random.default_rng(17)
        dim, n_pairs = 64, 60
        base = rng.standard_normal((n_pairs, dim))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        # perturb to land near cosine ~0.95-0.98: cos ≈ 1/sqrt(1+σ²·dim),
        # so σ in [0.03, 0.045] spans the band around the 0.95 threshold
        noise = rng.standard_normal((n_pairs, dim)) * rng.uniform(
            0.030, 0.045, (n_pairs, 1)
        )
        near = base + noise
        near /= np.linalg.norm(near, axis=1, keepdims=True)
        fill = rng.standard_normal((80, dim))
        fill /= np.linalg.norm(fill, axis=1, keepdims=True)
        vecs = np.concatenate([base, near, fill])
        rows = [(i, vecs[i].tolist(), "x") for i in range(len(vecs))]
        embs = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label string"
        )
        # ground truth: all pairs with cosine >= threshold
        sims = vecs @ vecs.T
        iu = np.triu_indices(len(vecs), k=1)
        truth = {
            (int(a), int(b))
            for a, b in zip(iu[0][sims[iu] >= 0.95], iu[1][sims[iu] >= 0.95])
        }
        assert len(truth) >= 30  # the construction planted enough
        got = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dups(embs, threshold=0.95).collect()
        }
        assert not (got - truth)  # exact verify: no false positives
        recall = len(got & truth) / len(truth)
        assert recall >= 0.95, recall

    def test_embedding_near_dups_md5_matches_local_twin(self, spark, sf_dir):
        """The md5-Rademacher oracle variant must equal a from-first-
        principles local twin: identical bucket codes (integer-quantized
        projections are exact), identical candidate set, identical
        rounded-double cosine verification — the exactness contract the
        DuckDB oracle (`emb_near_dups`) relies on."""
        import hashlib

        P, L, th = 6, 8, 0.4
        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        rows = embs.select("vec_id", "embedding").collect()
        ids = np.array([r["vec_id"] for r in rows])
        mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
        dim = mat.shape[1]
        signs = np.empty((L, P, dim), dtype=np.int64)
        for t in range(L):
            for p in range(P):
                for i in range(dim):
                    nib = hashlib.md5(f"{t}_{p}_{i}".encode()).hexdigest()[0]
                    signs[t, p, i] = 1 if int(nib, 16) % 2 else -1
        w = np.trunc(mat * 1e6).astype(np.int64)
        proj = np.tensordot(w, signs, axes=([1], [2]))
        codes = ((proj > 0) * (1 << np.arange(P))).sum(axis=2)
        from collections import defaultdict

        buck = defaultdict(list)
        for j in range(len(ids)):
            for t in range(L):
                buck[(t, codes[j, t])].append(j)
        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        want = set()
        for v in buck.values():
            for a in range(len(v)):
                for b in range(a + 1, len(v)):
                    x, y = sorted((int(ids[v[a]]), int(ids[v[b]])))
                    c = round(float(norm[v[a]] @ norm[v[b]]), 6)
                    if c >= th:
                        want.add((x, y, c))
        got = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in embedding_near_dups(
                embs, threshold=th, lsh_planes=P, tables=L, hash_fn="md5"
            ).collect()
        }
        assert got == want
        assert len(got) > 0  # sf0.001 yields collisions above 0.4


class TestSimilarity:
    @pytest.fixture(scope="class")
    def embs(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()

    def test_brute_force_matches_numpy_oracle(self, spark, embs):
        pdf = embs.toPandas()
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        queries = [(int(pdf["vec_id"][i]), pdf["embedding"][i]) for i in range(3)]
        res = brute_force_topk(spark, embs, queries, k=5).collect()
        for qid, qvec in queries:
            q = np.asarray(qvec) / np.linalg.norm(qvec)
            sims = mat @ q
            order = np.lexsort((pdf["vec_id"].to_numpy(), -np.round(sims, 6)))[:5]
            expect = [int(pdf["vec_id"][j]) for j in order]
            got = [r["vec_id"] for r in sorted(res, key=lambda r: r["rank"]) if r["query_id"] == qid]
            assert got == expect, qid

    def test_ivf_recall(self, spark, embs):
        cents = deterministic_centroids(embs, 16)
        assigned = ivf_assign(embs, cents).cache()
        assert assigned.select("ivf_list").distinct().count() > 4
        pdf = embs.limit(10).toPandas()
        queries = [(int(r.vec_id), r.embedding) for r in pdf.itertuples()]
        exact = brute_force_topk(spark, embs, queries, k=5).collect()
        approx = ivf_topk(spark, assigned, cents, queries, k=5, nprobe=6).collect()
        exact_sets = {}
        for r in exact:
            exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = total = 0
        for r in approx:
            total += 1
            hits += r["vec_id"] in exact_sets[r["query_id"]]
        assert total > 0
        assert hits / (5 * len(queries)) >= 0.5  # nprobe=6/16 lists

    def test_deterministic_centroids_md5_order(self, spark, embs):
        """order='md5' picks the n vectors with lexicographically smallest
        md5(str(vec_id)) — the DuckDB-twin-reproducible selection."""
        import hashlib

        cents = deterministic_centroids(embs, 8, order="md5")
        pdf = embs.toPandas()
        ranked = sorted(
            pdf["vec_id"].tolist(),
            key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
        )[:8]
        by_id = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
        for i, vid in enumerate(ranked):
            v = by_id[vid]
            v = v / np.linalg.norm(v)
            assert np.allclose(cents[i], v, atol=1e-12), vid


class TestTextStats:
    def test_token_stats(self, spark):
        df = spark.createDataFrame([(1, "Hello world, 42 times!")], "doc_id long, text string")
        r = token_stats(df).first()
        assert r["n_ws_tokens"] == 4
        # BPE-ish: Hello world , 42 times !  → 6
        assert r["n_bpe_tokens"] == 6

    def test_quality_score_orders_sanely(self, spark):
        good = "the quick brown fox jumps over a lazy dog " * 8
        spam = "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 " * 4
        repet = "buy buy buy buy buy buy buy buy " * 8
        df = spark.createDataFrame(
            [(1, good), (2, spam), (3, repet)], "doc_id long, text string"
        )
        q = {r["doc_id"]: r["quality"] for r in quality_score(df).collect()}
        assert q[1] > q[2] and q[1] > q[3]

    def test_repetition_stats_matches_python(self, spark):
        from collections import Counter

        texts = [
            "",                                        # empty
            "one",                                     # no bigrams
            "a b",                                     # single bigram
            "buy buy buy buy buy",                     # one dominant bigram
            "x y x y x y z",                           # interleaved repeats
            "b a b a a b",                             # tie between 'a b' and 'b a'
            "the quick brown fox jumps over the lazy dog",
            "  padded   whitespace\ttokens  ",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}

        def ref(text):
            toks = text.split()
            out = {"n_tokens": len(toks)}
            bi = [" ".join(toks[i : i + 2]) for i in range(max(0, len(toks) - 1))]
            tri = [" ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))]
            out["dup_bigram_frac"] = round(
                (len(bi) - len(set(bi))) / max(len(bi), 1), 6
            )
            chars = max(len(text), 1)
            for name, grams in (("bigram", bi), ("trigram", tri)):
                if grams:
                    c = Counter(grams)
                    top = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
                else:
                    top = ("", 0)
                if name == "bigram":
                    out["top_bigram"], out["top_bigram_cnt"] = top
                out[f"top_{name}_char_frac"] = round(top[1] * len(top[0]) / chars, 6)
            return out

        for i, t in enumerate(texts):
            exp = ref(t)
            for k, v in exp.items():
                g = got[i][k]
                if isinstance(v, float):
                    assert abs(g - v) < 1e-9, (i, k, g, v)
                else:
                    assert g == v, (i, k, g, v)

    def test_repetition_stats_plan_is_shuffle_free(self, spark):
        from biobloom_spark.plans import assert_no_shuffle

        df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
        assert_no_shuffle(repetition_stats(df), "repetition_stats")

    def test_pii_scrub_matches_python(self, spark):
        import re

        from biobloom_spark.operators.textstats import PII_PATTERNS, pii_scrub

        texts = [
            "contact a.b+c@mail-host.org or 10.0.0.255 now",
            "call 555-867-5309 or 555.867.5309; ip 999.1.2.3",
            "no pii here",
            "double jane@x.io john@y.co 1.2.3.4 1.2.3.4",
            "not-an-ip 1.2.3 phone 12-345-6789",
            "",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}
        for i, t in enumerate(texts):
            cur = t
            for name, pat, tok in PII_PATTERNS:
                assert got[i][f"pii_{name}s"] == len(re.findall(pat, cur)), (i, name)
                cur = re.sub(pat, tok, cur)
            assert got[i]["text_scrubbed"] == cur, (i, got[i]["text_scrubbed"], cur)
        assert "@" not in got[0]["text_scrubbed"]
        assert got[3]["pii_emails"] == 2 and got[3]["pii_ips"] == 2

    def test_pii_scrub_plan_is_shuffle_free(self, spark):
        from biobloom_spark.operators.textstats import pii_scrub
        from biobloom_spark.plans import assert_no_shuffle

        df = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
        assert_no_shuffle(pii_scrub(df), "pii_scrub")

    def test_null_text_contract(self, spark):
        """Null text rows (real crawl corpora have them) get empty-doc
        stats, never -1/null from null-propagating arithmetic."""
        from biobloom_spark.operators.textstats import pii_scrub

        df = spark.createDataFrame(
            [(1, None), (2, "a b a b a@b.co")], "doc_id long, text string"
        )
        rep = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
        assert rep[1]["n_tokens"] == 0
        assert rep[1]["dup_bigram_frac"] == 0.0
        assert rep[1]["top_bigram_cnt"] == 0
        assert rep[1]["top_bigram_char_frac"] == 0.0
        assert rep[1]["top_trigram_char_frac"] == 0.0
        assert rep[2]["n_tokens"] == 5
        pii = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}
        assert pii[1]["text_scrubbed"] == "" and pii[1]["pii_emails"] == 0
        assert pii[2]["pii_emails"] == 1

    def test_fingerprints_stable_and_containment(self, spark, dup_docs):
        fp = {r["doc_id"]: tuple(r["fingerprint"]) for r in doc_fingerprints(dup_docs).collect()}
        assert fp[0] == fp[60]
        shared = len(set(fp[1]) & set(fp[61]))
        assert shared >= 6  # near-dup shares most of its bottom-8 sketch

    def test_language_id_accuracy(self, spark):
        from biobloom_spark.corpus import generate_corpus

        corpus = generate_corpus(
            spark, 300, seed=77, langs=("en", "de", "fr"), shared_frac=0.2, num_partitions=4
        ).cache()
        profiles = train_language_profiles(spark, corpus, id_col="url")
        pred = language_id(spark, corpus, profiles, id_col="url")
        joined = pred.join(corpus.select("url", "lang"), on="url")
        acc = joined.filter(F.col("pred_lang") == F.col("lang")).count() / joined.count()
        assert acc > 0.9


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [
            (0, synthesize_media(0, 0, 640, 480, 1)),     # image
            (1, synthesize_media(1, 2, 320, 240, 100)),   # video
            (2, b"NOTMEDIA"),                              # corrupt
            (3, None),                                     # null
        ]
        return spark.createDataFrame(rows, "doc_id long, media binary").cache()

    def test_stub_decoder_raises(self, spark, media):
        with pytest.raises(Exception, match="NotImplementedError|codec"):
            decode_media_meta(media, decoder="stub").collect()

    def test_fake_decode_meta(self, spark, media):
        res = {r["doc_id"]: r["media_meta"] for r in decode_media_meta(media, decoder="fake").collect()}
        assert res[0]["kind"] == "image" and res[0]["width"] == 640
        assert res[1]["kind"] == "video" and res[1]["n_frames"] == 100
        assert res[2]["valid"] is False and res[3]["valid"] is False

    def test_fake_features_shape_and_determinism(self, spark, media):
        r1 = {r["doc_id"]: r["features"] for r in extract_features(media, dim=16, decoder="fake").collect()}
        r2 = {r["doc_id"]: r["features"] for r in extract_features(media, dim=16, decoder="fake").collect()}
        assert r1[0] == r2[0] and len(r1[0]) == 16
        assert abs(sum(x * x for x in r1[0]) - 1.0) < 1e-5
        assert r1[2] is None and r1[3] is None

    def test_frame_sampling_fanout(self, spark, media):
        frames = sample_frames(media, every_n=10, decoder="fake").collect()
        assert {r["doc_id"] for r in frames} == {1}  # only the video row
        assert sorted(r["frame_no"] for r in frames) == list(range(0, 100, 10))

    def test_fake_resize_rewrites_dims(self, spark, media):
        from biobloom_spark.operators.multimodal import resize_images

        res = {
            r["doc_id"]: r["media_resized"]
            for r in resize_images(media, out_h=16, out_w=12, decoder="fake").collect()
        }
        meta = {
            r["doc_id"]: r["media_meta"]
            for r in decode_media_meta(
                spark.createDataFrame(
                    [(k, v) for k, v in res.items() if v is not None],
                    "doc_id long, media binary",
                ),
                decoder="fake",
            ).collect()
        }
        assert meta[0]["width"] == 12 and meta[0]["height"] == 16
        assert 1 not in meta  # video row is not an image → null
        assert res[2] is None and res[3] is None


class TestMultimodalStdlibCodecs:
    """The ``stdlib`` decoder path: REAL PNG/BMP/PNM/WAV decode inside the
    Spark plumbing (functions/codecs.py — pure stdlib + numpy)."""

    @pytest.fixture(scope="class")
    def real_media(self, spark):
        from biobloom_spark.functions.codecs import (
            encode_bmp,
            encode_gif,
            encode_png,
            encode_pnm,
            encode_tiff,
            encode_wav,
        )

        rng = np.random.default_rng(1234)
        img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
        audio = rng.integers(-20000, 20000, size=(800, 2)).astype(np.int16)
        palette = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
        anim = palette[rng.integers(0, 8, size=(5, 6, 7))]  # 5-frame 6x7 GIF
        rows = [
            (0, encode_png(img, row_filters=[0, 1, 2, 3, 4] * 4 + [2, 4, 1, 3])),
            (1, encode_bmp(img)),                        # same pixels, other container
            (2, encode_pnm(img)),
            (3, encode_wav(audio, 16000)),
            (4, b"\x89PNG\r\n\x1a\nBUTTRUNCATED"),       # corrupt: sniffs, fails decode
            (5, b"NOTMEDIA"),                             # corrupt: fails sniff
            (6, None),                                    # null
            (7, synthesize_media(7, 0, 64, 32, 1)),       # synthetic rides along
            (8, encode_gif(anim)),                        # animated GIF = real video
            (9, encode_tiff(img, big_endian=True)),       # same pixels, 4th container
        ]
        return spark.createDataFrame(rows, "doc_id long, media binary").cache()

    def test_stdlib_decode_meta(self, spark, real_media):
        res = {
            r["doc_id"]: r["media_meta"]
            for r in decode_media_meta(real_media, decoder="stdlib").collect()
        }
        for i in (0, 1, 2, 9):  # PNG / BMP / PNM / TIFF all really decoded
            assert res[i]["kind"] == "image"
            assert (res[i]["width"], res[i]["height"]) == (17, 24)
            assert res[i]["n_frames"] == 1
        assert res[3]["kind"] == "audio"
        assert res[3]["width"] == 2 and res[3]["n_frames"] == 800  # channels, frames
        assert res[4]["valid"] is False  # truncated PNG → invalid row, not a crash
        assert res[5]["valid"] is False and res[6]["valid"] is False
        assert res[7]["kind"] == "image" and res[7]["width"] == 64  # bbmm passthrough

    def test_stdlib_features_container_invariance(self, spark, real_media):
        res = {
            r["doc_id"]: r["features"]
            for r in extract_features(real_media, dim=16, decoder="stdlib").collect()
        }
        # identical pixels through PNG, BMP, PNM and TIFF → identical vector
        assert res[0] == res[1] == res[2] == res[9]
        assert len(res[0]) == 16 and abs(sum(x * x for x in res[0]) - 1.0) < 1e-5
        # audio features: real RMS windows, normalized
        assert len(res[3]) == 16 and abs(sum(x * x for x in res[3]) - 1.0) < 1e-5
        assert res[4] is None and res[5] is None and res[6] is None
        assert res[7] is not None  # synthetic falls back to the payload histogram

    def test_stdlib_resize_roundtrip(self, spark, real_media):
        from biobloom_spark.functions.codecs import decode_png, resize_nearest
        from biobloom_spark.operators.multimodal import resize_images

        res = {
            r["doc_id"]: r["media_resized"]
            for r in resize_images(
                real_media, out_h=8, out_w=6, decoder="stdlib"
            ).collect()
        }
        rng = np.random.default_rng(1234)
        img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
        expect = resize_nearest(img, 8, 6)
        for i in (0, 1, 2):  # every container decodes, resizes, re-encodes as PNG
            out = decode_png(bytes(res[i]))
            np.testing.assert_array_equal(out, expect)
        assert res[3] is None and res[4] is None and res[6] is None  # audio/corrupt/null

    def test_stdlib_decode_meta_gif_video(self, spark, real_media):
        res = {
            r["doc_id"]: r["media_meta"]
            for r in decode_media_meta(real_media, decoder="stdlib").collect()
        }
        assert res[8]["kind"] == "video"
        assert (res[8]["width"], res[8]["height"], res[8]["n_frames"]) == (7, 6, 5)

    def test_stdlib_frame_sampling_really_decodes_gif(self, spark, real_media):
        from biobloom_spark.functions.codecs import decode_png, encode_gif

        rows = sample_frames(real_media, every_n=2, decoder="stdlib").collect()
        assert {r["doc_id"] for r in rows} == {8}  # only the animated GIF fans out
        got = {r["frame_no"]: bytes(r["frame_png"]) for r in rows}
        assert sorted(got) == [0, 2, 4]
        rng = np.random.default_rng(1234)
        rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
        rng.integers(-20000, 20000, size=(800, 2))
        palette = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
        anim = palette[rng.integers(0, 8, size=(5, 6, 7))]
        for f in (0, 2, 4):  # sampled frames decode to the exact source pixels
            np.testing.assert_array_equal(decode_png(got[f]), anim[f])

    def test_stub_frame_sampling_still_raises(self, spark, real_media):
        with pytest.raises(Exception, match="video codec|NotImplementedError"):
            sample_frames(real_media, decoder="stub").collect()
