"""Skew measurement + salted repartitioning (operators/skew.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from biobloom_spark.operators.skew import (
    key_distribution,
    plan_salts,
    salted_repartition,
    skew_metrics,
    url_domain_col,
)


@pytest.fixture(scope="module")
def zipf_docs(spark):
    """Deterministic zipf-skewed (doc_id, domain, nbytes) frame: domain 0
    holds ~half the rows — the salting stress shape."""
    rng = np.random.default_rng(7)
    dom = rng.zipf(1.5, size=4000) % 50
    rows = [
        (int(i), f"site{int(d)}.example", int(100 + (i % 7) * 10))
        for i, d in enumerate(dom)
    ]
    return spark.createDataFrame(rows, "doc_id: long, domain: string, nbytes: long")


class TestKeyDistribution:
    def test_counts_and_shares_exact(self, spark, zipf_docs):
        dist = key_distribution(zipf_docs, "domain").collect()
        import collections

        truth = collections.Counter(r["domain"] for r in zipf_docs.collect())
        total = sum(truth.values())
        got = {r["key"]: r for r in dist}
        assert set(got) == set(truth)
        for k, n in truth.items():
            assert got[k]["n_rows"] == n
            assert got[k]["weight"] == float(n)
            assert got[k]["share"] == pytest.approx(n / total, abs=1e-6)

    def test_weight_col(self, spark, zipf_docs):
        dist = {r["key"]: r for r in key_distribution(zipf_docs, "domain", "nbytes").collect()}
        truth = {
            r["key"]: r["wb"]
            for r in zipf_docs.groupBy(F.col("domain").alias("key"))
            .agg(F.sum("nbytes").alias("wb"))
            .collect()
        }
        for k, wb in truth.items():
            assert dist[k]["weight"] == float(wb)

    def test_no_global_window_in_plan(self, zipf_docs):
        """share must come from a broadcast total, not a single-partition
        window (which would single-task 10^8 domain rows at web scale)."""
        plan = key_distribution(zipf_docs, "domain")._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


class TestSkewMetrics:
    def test_matches_manual(self, spark, zipf_docs):
        row = skew_metrics(key_distribution(zipf_docs, "domain")).collect()[0]
        import collections

        counts = collections.Counter(r["domain"] for r in zipf_docs.collect())
        total = sum(counts.values())
        shares = np.array(sorted(counts.values(), reverse=True)) / total
        assert row["n_keys"] == len(counts)
        assert row["top1_share"] == pytest.approx(shares[0], abs=1e-6)
        hhi = float((shares**2).sum())
        assert row["hhi"] == pytest.approx(hhi, abs=1e-6)
        assert row["effective_keys"] == pytest.approx(1.0 / hhi, abs=0.05)

    def test_uniform_effective_keys(self, spark):
        docs = spark.createDataFrame(
            [(i, f"k{i % 10}") for i in range(1000)], "doc_id: long, key: string"
        )
        row = skew_metrics(key_distribution(docs, "key")).collect()[0]
        assert row["n_keys"] == 10
        assert row["hhi"] == pytest.approx(0.1, abs=1e-6)
        assert row["effective_keys"] == pytest.approx(10.0, abs=0.05)


class TestSaltedRepartition:
    def test_group_sizes_bounded_and_rows_preserved(self, spark, zipf_docs):
        budget = 200
        salts = plan_salts(zipf_docs, "domain", budget)
        salted = salted_repartition(zipf_docs, "domain", salts, "doc_id")
        # every (domain, salt) group lands under ~budget + hash-imbalance slack
        sizes = salted.groupBy("domain", "salt").count().collect()
        n_salts = {r["key"]: r["n_salts"] for r in salts.collect()}
        import collections

        truth = collections.Counter(r["domain"] for r in zipf_docs.collect())
        for r in sizes:
            k = r["domain"]
            # expected size budget with 50% hash-imbalance slack
            assert r["count"] <= 1.5 * (truth[k] / n_salts[k]) + 8
        # partition-invariance: no row lost or duplicated
        assert salted.count() == zipf_docs.count()
        assert (
            salted.groupBy("domain").count().orderBy("domain").collect()
            == zipf_docs.groupBy("domain").count().orderBy("domain").collect()
        )

    def test_salt_deterministic_across_parallelism(self, spark, zipf_docs):
        salts = plan_salts(zipf_docs, "domain", 200)
        a = salted_repartition(zipf_docs, "domain", salts, "doc_id")
        b = salted_repartition(zipf_docs.repartition(13), "domain", salts, "doc_id")
        rows_a = {r["doc_id"]: r["salt"] for r in a.collect()}
        rows_b = {r["doc_id"]: r["salt"] for r in b.collect()}
        assert rows_a == rows_b

    def test_light_keys_skip_broadcast(self, spark, zipf_docs):
        """Keys under budget get salt 0 without joining (n_salts==1 rows
        are filtered out of the broadcast dim)."""
        salts = plan_salts(zipf_docs, "domain", 10**9)  # nothing heavy
        assert salts.filter(F.col("n_salts") > 1).count() == 0
        salted = salted_repartition(zipf_docs, "domain", salts, "doc_id")
        assert salted.select(F.max("salt")).collect()[0][0] == 0

    def test_two_level_agg_equals_direct(self, spark, zipf_docs):
        """The downstream pattern: agg by (key, salt) then key == direct."""
        salts = plan_salts(zipf_docs, "domain", 100)
        salted = salted_repartition(zipf_docs, "domain", salts, "doc_id")
        two = (
            salted.groupBy("domain", "salt")
            .agg(F.sum("nbytes").alias("b"), F.count(F.lit(1)).alias("n"))
            .groupBy("domain")
            .agg(F.sum("b").alias("b"), F.sum("n").alias("n"))
        )
        direct = zipf_docs.groupBy("domain").agg(
            F.sum("nbytes").alias("b"), F.count(F.lit(1)).alias("n")
        )
        assert sorted(map(tuple, two.collect())) == sorted(map(tuple, direct.collect()))


class TestUrlDomain:
    def test_extraction(self, spark):
        rows = [
            ("https://site3.example/en/page9", "site3.example"),
            ("http://a.b.c:8080/x?q=1", "a.b.c:8080"),
            ("ftp://files.example/", "files.example"),
            ("not a url", ""),
            ("", ""),
        ]
        df = spark.createDataFrame([(u,) for u, _ in rows], "url: string")
        got = [r[0] for r in df.select(url_domain_col("url")).collect()]
        assert got == [d for _, d in rows]

    def test_on_synth_corpus(self, spark):
        from biobloom_spark.corpus import generate_corpus

        docs = generate_corpus(spark, n_docs=200, seed=11)
        doms = docs.select(url_domain_col("url").alias("d")).distinct().collect()
        assert all(r["d"].startswith("site") and r["d"].endswith(".example") for r in doms)


class TestStratifiedSample:
    def test_quota_and_determinism(self, spark, zipf_docs):
        from biobloom_spark.operators.sampling import stratified_sample

        out = stratified_sample(zipf_docs, "domain", 5, id_col="doc_id")
        rows = out.collect()
        import collections

        per = collections.Counter(r["domain"] for r in rows)
        assert max(per.values()) <= 5
        # light keys (< 5 rows) keep everything
        truth = collections.Counter(r["domain"] for r in zipf_docs.collect())
        for k, n in truth.items():
            assert per[k] == min(n, 5), k
        # reproducible across partitionings
        again = stratified_sample(zipf_docs.repartition(13), "domain", 5).collect()
        assert {(r["doc_id"], r["sample_rank"]) for r in rows} == {
            (r["doc_id"], r["sample_rank"]) for r in again
        }

    def test_md5_draw_matches_python(self, spark, zipf_docs):
        import hashlib

        from biobloom_spark.operators.sampling import stratified_sample

        out = stratified_sample(zipf_docs, "domain", 3).collect()
        all_rows = zipf_docs.collect()
        by_dom: dict = {}
        for r in all_rows:
            by_dom.setdefault(r["domain"], []).append(r["doc_id"])
        want = set()
        for dom, ids in by_dom.items():
            ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
            for rk, i in enumerate(ranked[:3], start=1):
                want.add((dom, i, rk))
        got = {(r["domain"], r["doc_id"], r["sample_rank"]) for r in out}
        assert got == want

    def test_best_first_order(self, spark):
        from pyspark.sql import functions as F

        from biobloom_spark.operators.sampling import stratified_sample

        df = spark.createDataFrame(
            [(i, "k", float(i % 10)) for i in range(30)],
            "doc_id: long, key: string, quality: double",
        )
        out = stratified_sample(
            df, "key", 4, order_by=F.col("quality").desc()
        ).collect()
        assert sorted(r["quality"] for r in out) == [8.0, 9.0, 9.0, 9.0]
        # ties broke by doc_id asc: the three 9.0 docs are 9, 19, 29 then 8
        assert sorted(r["doc_id"] for r in out) == [8, 9, 19, 29]
