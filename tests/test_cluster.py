"""Connected-components / dedup-cluster tests: the Spark large-star/
small-star implementation vs a driver-side union-find oracle, plus the
two-phase (LSH proposes, exact verifies) pipeline equivalence that makes
the gate queries oracle-checkable."""

from __future__ import annotations

import random

import pytest

from biobloom_spark.corpus import generate_corpus_pandas
from biobloom_spark.operators.cluster import connected_components, dedup_clusters
from biobloom_spark.operators.dedup import (
    exact_jaccard_on_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    """60 base docs + planted exact dup + planted near dup (same recipe
    as tests/test_pipeline_ops.py)."""
    pdf = generate_corpus_pandas(60, seed=31, langs=("en", "de"), mean_tokens=60)
    texts = list(pdf["text"])
    texts.append(texts[0])  # exact dup of doc 0 → id 60
    toks = texts[1].split()
    toks[len(toks) // 2] = "MUTATED"
    texts.append(" ".join(toks))  # near dup of doc 1 → id 61
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).cache()


def _union_find_labels(edges):
    """Driver oracle: min node id per component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns) for ns in comp.values() for n in ns}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


class TestConnectedComponents:
    def test_two_triangles_and_bridge(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10), (20, 21)]
        assert _cc_spark(spark, edges) == _union_find_labels(edges)

    def test_long_chain_converges_in_log_rounds(self, spark):
        # a 64-node path: naive min-propagation needs 63 rounds; the
        # star algorithm must finish well inside max_iter=12
        edges = [(i, i + 1) for i in range(63)]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        rows = connected_components(df, max_iter=12).collect()
        assert {r["component"] for r in rows} == {0}
        assert {r["node"] for r in rows} == set(range(64))

    def test_random_graphs_match_union_find(self, spark):
        rng = random.Random(0xC0FFEE)
        for _ in range(4):
            n = rng.randrange(10, 60)
            m = rng.randrange(5, 80)
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(m)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            if not edges:
                continue
            assert _cc_spark(spark, edges) == _union_find_labels(edges)

    def test_string_ids(self, spark):
        edges = [("b", "a"), ("c", "b"), ("x", "y")]
        df = spark.createDataFrame(edges, "id_a string, id_b string")
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_empty_pairs(self, spark):
        df = spark.createDataFrame([], "id_a long, id_b long")
        assert connected_components(df).count() == 0


class TestDedupClusters:
    def test_singletons_and_chain(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
        rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
        assert {i: rows[i]["cluster_id"] for i in range(6)} == {
            0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5,
        }
        assert [rows[i]["is_canonical"] for i in range(6)] == [
            True, False, False, True, True, True,
        ]

    def test_labels_match_union_find_with_singletons(self, spark, dup_docs):
        pairs = ngram_jaccard_pairs(dup_docs, w=3, threshold=0.5)
        edge_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
        assert (60, 61) not in edge_rows  # sanity: dups of DIFFERENT docs
        assert any(60 in e for e in edge_rows) and any(61 in e for e in edge_rows)
        oracle = _union_find_labels(edge_rows)
        labeled = dedup_clusters(dup_docs, pairs)
        got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in labeled.collect()}
        for i in range(dup_docs.count()):
            want = oracle.get(i, i)  # singletons label themselves
            assert got[i] == (want, want == i)
        n_clusters = len({c for c, _ in got.values()})
        assert sum(1 for _, canon in got.values() if canon) == n_clusters


class TestTwoPhaseEquivalence:
    def test_lsh_verified_equals_exact_twin(self, spark, dup_docs):
        """High-recall banding (r=2, b=64) + exact verification == the
        exact self-join — the property the gate oracles rely on."""
        cand = minhash_lsh_pairs(
            dup_docs, w=3, num_perm=128, bands=64, threshold=0.5, verify=False
        )
        verified = exact_jaccard_on_pairs(dup_docs, cand, w=3, threshold=0.5)
        exact = ngram_jaccard_pairs(dup_docs, w=3, threshold=0.5)
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
        want = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact.collect()}
        assert got == want
        assert want, "fixture must contain at least the planted dups"

    def test_verify_filters_false_candidates(self, spark, dup_docs):
        """Candidates below the threshold must not survive verification."""
        cand = minhash_lsh_pairs(
            dup_docs, w=3, num_perm=128, bands=64, threshold=0.1, verify=False
        )
        verified = exact_jaccard_on_pairs(dup_docs, cand, w=3, threshold=0.9)
        for r in verified.collect():
            assert r["jaccard"] >= 0.9
