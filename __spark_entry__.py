"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship Bloom build+categorize on sf0.001.
``queries``: one entry per implemented operator slice (SURVEY.md §2);
``oracle_sql``: DuckDB-equivalent SQL for every SQL-expressible query.
Bloom/sketch decisions themselves are approximate-membership ops (not
SQL-expressible) → registered rows-only; their exactness is covered by the
pytest exact-set oracles (tests/test_e2e_spark.py) and by the
``exact_*`` query twins here, which ARE fully oracle-checked.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHINGLE_W = 3
EXACT_TAU = 0.5

# ---------------------------------------------------------------------------
# shared Spark fragments (token semantics must mirror oracle SQL exactly)
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _with_tokens(docs: DataFrame) -> DataFrame:
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    return docs.withColumn("toks", toks).withColumn("n_tokens", F.size("toks"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_sizing_prepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: expected-entry counting pre-pass (BloomFilterGenerator.h:108-141)."""
    d = _with_tokens(_docs(spark, sf_dir))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.greatest(F.lit(0), F.col("n_tokens") - F.lit(SHINGLE_W - 1))).alias(
            "frames"
        ),
    )


def q_distinct_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct frames per filter key — the oracle twin of the
    registry's HLL/num_entries (A1 side counters)."""
    from biobloom_spark.operators.exact import shingle_frames

    sh = shingle_frames(_docs(spark, sf_dir).select("doc_id", "lang", "text"), "text", SHINGLE_W)
    return sh.groupBy("lang").agg(
        F.countDistinct("shingle").alias("distinct_shingles")
    )


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS oracle twin: global top-20 token frequencies (deterministic
    tie-break on token)."""
    d = _with_tokens(_docs(spark, sf_dir))
    counts = (
        d.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.orderBy(F.desc("cnt"), F.asc("token")).limit(20)


def q_doc_len_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest/KLL oracle twin: exact interpolated token-count quantiles."""
    d = _with_tokens(_docs(spark, sf_dir))
    return d.groupBy("lang").agg(
        F.round(F.expr("percentile(n_tokens, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(n_tokens, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_tokens, 0.75)"), 6).alias("p75"),
    )


def q_exact_classify_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship relational slice: exact set-membership classification
    (categorizer STD semantics, SURVEY.md §2.9) + summary counts (A5)."""
    from biobloom_spark.operators.exact import exact_classify_summary

    return exact_classify_summary(
        _docs(spark, sf_dir), "lang", "doc_id", "text", SHINGLE_W, EXACT_TAU
    )


def q_exact_filter_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-filter hit counters (aboveThreshold column of the summary sink,
    ResultsManager.hpp:191-237), exact-membership flavor."""
    from biobloom_spark.operators.exact import exact_classify, shingle_frames

    docs = _docs(spark, sf_dir)
    sh = shingle_frames(docs.select("doc_id", "lang", "text"), "text", SHINGLE_W)
    refsets = F.broadcast(sh.select(F.col("lang").alias("ref_key"), "shingle").distinct())
    frames = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("frames"))
    hits = (
        sh.join(refsets, on="shingle")
        .groupBy("doc_id", "ref_key")
        .agg(F.count(F.lit(1)).alias("hit_frames"))
        .join(frames, on="doc_id")
        .filter(F.col("hit_frames") >= F.lit(EXACT_TAU) * F.col("frames"))
    )
    return hits.groupBy(F.col("ref_key").alias("filter_id")).agg(
        F.count(F.lit(1)).alias("hits")
    )


def q_bloom_categorize_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real Bloom pipeline (approximate-membership → rows-only check;
    exactness is pytest-verified against the exact twin above)."""
    from biobloom_spark.config import BuildConfig
    from biobloom_spark.operators import build_filters, categorize, load_registry, summarize

    docs = _docs(spark, sf_dir)
    reg = build_filters(
        spark, docs, key_col="lang", text_col="text", id_col="doc_id",
        build=BuildConfig(num_buckets=8, merge_groups=4),
    )
    filters = load_registry(reg)
    res = categorize(spark, docs, filters, id_col="doc_id")
    return summarize(res, [f["filter_id"] for f in filters])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "sizing_prepass": q_sizing_prepass,
        "distinct_shingles": q_distinct_shingles,
        "token_topk": q_token_topk,
        "doc_len_quantiles": q_doc_len_quantiles,
        "exact_classify_summary": q_exact_classify_summary,
        "exact_filter_hits": q_exact_filter_hits,
        "bloom_categorize_summary": q_bloom_categorize_summary,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; views pre-registered by the driver)
# ---------------------------------------------------------------------------

_TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"

_SHINGLES_CTE = f"""
WITH toks AS (
  SELECT doc_id, lang, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id, lang, array_to_string(t[i:i+{SHINGLE_W - 1}], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, GREATEST(0, len(t) - {SHINGLE_W - 1}))) AS u(i)
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "sizing_prepass": f"""
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS docs,
                   CAST(SUM(GREATEST(0, len({_TOKS}) - {SHINGLE_W - 1})) AS BIGINT) AS frames
            FROM documents GROUP BY lang
        """,
        "distinct_shingles": _SHINGLES_CTE
        + """
            SELECT lang, CAST(COUNT(DISTINCT shingle) AS BIGINT) AS distinct_shingles
            FROM sh GROUP BY lang
        """,
        "token_topk": f"""
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest({_TOKS}) AS token FROM documents)
            GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20
        """,
        "doc_len_quantiles": f"""
            WITH t AS (SELECT lang, len({_TOKS}) AS n_tokens FROM documents)
            SELECT lang,
                   ROUND(quantile_cont(n_tokens, 0.25), 6) AS p25,
                   ROUND(quantile_cont(n_tokens, 0.5), 6) AS p50,
                   ROUND(quantile_cont(n_tokens, 0.75), 6) AS p75
            FROM t GROUP BY lang
        """,
        "exact_classify_summary": _SHINGLES_CTE
        + f"""
            , refsets AS (SELECT DISTINCT lang AS ref_key, shingle FROM sh),
            frames AS (SELECT doc_id, count(*) AS frames FROM sh GROUP BY doc_id),
            hits AS (
              SELECT s.doc_id, r.ref_key, count(*) AS hit_frames
              FROM sh s JOIN refsets r USING (shingle) GROUP BY s.doc_id, r.ref_key
            ),
            scored AS (
              SELECT h.doc_id, h.ref_key FROM hits h JOIN frames f USING (doc_id)
              WHERE h.hit_frames >= {EXACT_TAU} * f.frames
            ),
            agg AS (SELECT doc_id, count(*) AS nhits, min(ref_key) AS only FROM scored GROUP BY doc_id)
            SELECT CASE WHEN a.nhits IS NULL THEN 'noMatch'
                        WHEN a.nhits = 1 THEN a.only
                        ELSE 'multiMatch' END AS assigned,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM documents d LEFT JOIN agg a USING (doc_id)
            GROUP BY 1
        """,
        "exact_filter_hits": _SHINGLES_CTE
        + f"""
            , refsets AS (SELECT DISTINCT lang AS ref_key, shingle FROM sh),
            frames AS (SELECT doc_id, count(*) AS frames FROM sh GROUP BY doc_id),
            hits AS (
              SELECT s.doc_id, r.ref_key, count(*) AS hit_frames
              FROM sh s JOIN refsets r USING (shingle) GROUP BY s.doc_id, r.ref_key
            )
            SELECT h.ref_key AS filter_id, CAST(count(*) AS BIGINT) AS hits
            FROM hits h JOIN frames f USING (doc_id)
            WHERE h.hit_frames >= {EXACT_TAU} * f.frames
            GROUP BY h.ref_key
        """,
        # bloom_categorize_summary: approximate-membership → rows-only check
    }


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Bloom maker + categorizer + summary on sf0.001."""
    return q_bloom_categorize_summary(spark, "/root/testdata/sf0.001")
