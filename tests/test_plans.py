"""Plan audits: the scale guarantees are plan properties — assert them.

A refactor that silently adds a shuffle to categorize, or un-prunes the
sizing scan, passes every correctness test and still melts a
1000-executor run.  These tests pin the plan shape.
"""

from __future__ import annotations

import os

import pytest

from biobloom_spark.config import BloomParams, BuildConfig
from biobloom_spark.operators.categorizer import categorize
from biobloom_spark.operators.dedup import embedding_near_dups, minhash_lsh_pairs
from biobloom_spark.operators.maker import build_filters, load_registry
from biobloom_spark.plans import (
    assert_no_cartesian,
    assert_no_shuffle,
    count_exchanges,
    scan_read_schema,
)

SMOKE_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pq_corpus(spark, tmp_path_factory):
    """Parquet-backed corpus so scans show ReadSchema / pushed filters."""
    from biobloom_spark.corpus import generate_corpus

    path = str(tmp_path_factory.mktemp("plans") / "corpus")
    generate_corpus(spark, 200, seed=3, langs=("en", "de"), mean_tokens=40).write.parquet(path)
    return spark.read.parquet(path)


def test_categorize_plan_is_shuffle_free(spark, pq_corpus):
    """J1 contract: broadcast filters + one mapInPandas — the corpus moves
    zero times (SURVEY.md §2.3; the 100 TB plan)."""
    reg = load_registry(
        build_filters(spark, pq_corpus, id_col="url",
                      build=BuildConfig(num_buckets=1, merge_groups=1))
    )
    result = categorize(spark, pq_corpus, reg, id_col="url")
    assert_no_shuffle(result, "categorize")


def test_categorize_scan_prunes_columns(spark, pq_corpus):
    """Categorize reads only (id, text) — the scan must not drag the other
    corpus columns through the Arrow bridge."""
    reg = load_registry(
        build_filters(spark, pq_corpus, id_col="url",
                      build=BuildConfig(num_buckets=1, merge_groups=1))
    )
    result = categorize(spark, pq_corpus, reg, id_col="url")
    cols = scan_read_schema(result)
    assert set(cols) == {"url", "text"}, cols


def test_lsh_joins_are_not_cartesian(spark, pq_corpus):
    """Candidate generation must stay bucket-join shaped."""
    pairs = minhash_lsh_pairs(pq_corpus, id_col="url", num_perm=32, bands=8)
    assert_no_cartesian(pairs, "minhash_lsh_pairs")


def test_embedding_lsh_not_cartesian(spark):
    embs = spark.read.parquet(os.path.join(SMOKE_DIR, "embeddings.parquet"))
    pairs = embedding_near_dups(embs, tables=4, lsh_planes=8)
    assert_no_cartesian(pairs, "embedding_near_dups")


def test_bucketed_build_shuffles_corpus_once(spark, pq_corpus):
    """The salted bucketed build moves documents exactly once (stage 2);
    later stages shuffle only sketch-sized partial rows."""
    reg = build_filters(
        spark, pq_corpus, id_col="url",
        params=BloomParams(),
        build=BuildConfig(strategy="bucketed", num_buckets=4, merge_groups=2),
    )
    # corpus-sized exchanges: the repartition before applyInPandas; the
    # partial/merge exchanges carry a handful of sketch rows each
    assert count_exchanges(reg) <= 3, count_exchanges(reg)


def test_mibf_classify_plan_is_shuffle_free(spark, pq_corpus):
    """MI classify is the same broadcast + one-map-pass shape as the plain
    categorizer — the query corpus (the 100 TB side) never shuffles."""
    from biobloom_spark.operators.mibf import build_mibf, classify_mibf

    sk = build_mibf(spark, pq_corpus, key_col="lang", occupancy=0.1)
    res = classify_mibf(spark, pq_corpus, sk, id_col="url")
    assert_no_shuffle(res, "classify_mibf")
    cols = scan_read_schema(res)
    assert set(cols) == {"url", "text"}, cols


def test_chunked_categorize_one_stitch_shuffle(spark, pq_corpus):
    """The sharded/chunked path's only shuffle is the single row-keyed
    stitch (groupBy __row); each pass stays a map-side scan.  A refactor
    that adds a second corpus shuffle per pass would still pass the
    equivalence tests and melt at scale — pin it here."""
    from biobloom_spark.plans import assert_no_cartesian

    reg = load_registry(
        build_filters(spark, pq_corpus, id_col="url",
                      build=BuildConfig(num_buckets=1, merge_groups=1))
    )
    cap = min(len(f["bitmap"]) for f in reg) // 2
    result = categorize(spark, pq_corpus, reg, id_col="url",
                        max_broadcast_bytes=cap)
    n = count_exchanges(result)
    assert n == 1, f"expected exactly the stitch exchange, found {n}"
    assert_no_cartesian(result, "chunked categorize")


def test_merge_registries_single_exchange(spark, pq_corpus, tmp_path):
    """Registry OR-merge = union + one groupBy(filter_id): exactly one
    shuffle of bitmap-sized rows on top of its (materialized) inputs,
    nothing driver-side."""
    from biobloom_spark.operators.maker import merge_registries, size_filters

    sizing = size_filters(pq_corpus, "lang", "text", BloomParams())
    regs = []
    for i in range(2):
        p = str(tmp_path / f"reg{i}")
        build_filters(
            spark, pq_corpus, id_col="url", expected_sizing=sizing
        ).write.parquet(p)
        regs.append(spark.read.parquet(p))
    merged = merge_registries(*regs)
    n = count_exchanges(merged)
    assert n == 1, f"expected one merge exchange, found {n}"


def test_key_distribution_no_global_window(spark, pq_corpus):
    """Skew measurement must not single-task the key rows (broadcast
    total, not a window over an unpartitioned frame)."""
    from biobloom_spark.operators.skew import key_distribution
    from biobloom_spark.plans import plan_string

    dist = key_distribution(pq_corpus, "lang")
    assert "Window" not in plan_string(dist, "simple")


def test_exact_verify_stage_not_cartesian(spark, pq_corpus):
    """The two-phase dedup verify (candidates → exact Jaccard) must stay
    equi-join shaped: intersections from a (pair, shingle) join, never a
    pairwise text comparison."""
    from biobloom_spark.operators.dedup import exact_jaccard_on_pairs

    cand = minhash_lsh_pairs(pq_corpus, id_col="url", num_perm=32, bands=16,
                             threshold=0.5, verify=False)
    verified = exact_jaccard_on_pairs(pq_corpus, cand, id_col="url",
                                      text_col="text", threshold=0.5)
    assert_no_cartesian(verified, "exact_jaccard_on_pairs")


def test_connected_components_rounds_are_bucket_joins(spark):
    """One large-star + small-star round over a symbolic edge set: all
    equi-joins (no cartesian), bounded exchanges — the per-round cost the
    O(log^2 n) convergence multiplies.

    Measured on the shape production executes: ``connected_components``
    localCheckpoints the edge set every round, so a round's lineage
    starts at a checkpoint.  (The static plan string of the
    un-checkpointed composite inlines the upstream subtree once per
    reference and over-counts wildly — 25+ nodes for the same 9 executed
    shuffles.)"""
    import re

    from biobloom_spark.operators.cluster import _canonical, _large_star, _small_star

    edges = _canonical(
        spark.range(100).selectExpr("id AS u", "id % 17 AS v")
    ).localCheckpoint()
    round1 = _small_star(_large_star(edges))
    assert_no_cartesian(round1, "large/small star round")
    round1.count()
    executed = round1._jdf.queryExecution().executedPlan().toString()
    n_shuffles = len(re.findall(r"Exchange (hash|range|RoundRobin)", executed))
    # 2 aggregations + 2 joins + 3 distincts worth of shuffles over the
    # (tiny, shrinking) edge set — never corpus-scale, and a blown-up plan
    # here multiplies per ROUND, so pin an upper bound on what executes
    assert n_shuffles <= 10, (n_shuffles, executed)
    assert "CartesianProduct" not in executed


def test_stratified_sample_uses_window_group_limit(spark, pq_corpus):
    """The rank-limit filter must compile to WindowGroupLimit (map-side
    partial top-n before the shuffle) — without it a heavy key ships its
    full weight to one task and the quota op stops scaling."""
    from biobloom_spark.operators.sampling import stratified_sample
    from biobloom_spark.plans import plan_string

    out = stratified_sample(pq_corpus, "lang", 5, id_col="url")
    assert "WindowGroupLimit" in plan_string(out, "simple")


def test_resume_skip_keeps_arrow_scan(spark, pq_corpus):
    """Round 6: the checkpoint-resume partition skip must live inside the
    Arrow kernel (TaskContext), not an RDD filter — a resumed build keeps
    the vectorized parquet scan with no Python-RDD round-trip."""
    from biobloom_spark.operators.sketch_agg import _partials_df

    df = _partials_df(
        pq_corpus, "lang", "text", "tokens", 3, fanout=2,
        with_part_id=True, skip_partitions={0},
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan and "SQLExecutionRDD" not in plan
    assert "Scan parquet" in plan
    # and the skip is effective: partition 0 emits nothing
    import pyspark.sql.functions as F

    parts = {r["part_id"] for r in df.select("part_id").distinct().collect()}
    assert 0 not in parts
    n_parts = pq_corpus.rdd.getNumPartitions()
    full = _partials_df(
        pq_corpus, "lang", "text", "tokens", 3, fanout=2, with_part_id=True,
    )
    all_parts = {r["part_id"] for r in full.select("part_id").distinct().collect()}
    assert parts == all_parts - {0}
