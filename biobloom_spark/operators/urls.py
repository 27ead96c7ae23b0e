"""URL canonicalization + canonical-URL dedup.

Stage-1 dedup of every web-corpus pipeline: the same page is captured
under cosmetically different URLs (scheme/host case, default ports,
fragments, tracking parameters, trailing slashes, query-parameter
order), so recrawl dedup must key on a *canonical* form, not the raw
string.  No bcgsc/biobloom counterpart (genomic reads have no URLs) —
this complements ``dedup.snapshot_dedup`` (keep-newest per key) with the
key normalization it needs on real crawl data.

Everything is a pure JVM expression chain (regexp + higher-order list
ops), deterministic, and exactly reproducible by a SQL twin — the
normalization rules are the contract, stated once in ``normalize_url``
and mirrored pattern-for-pattern in the gate oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["TRACKING_PARAM_RE", "normalize_url", "url_dedup"]

#: query parameters dropped during canonicalization (analytics/click IDs
#: that never change page content).  Anchored full-name match on the part
#: before '='; ASCII-only so Java regex and RE2 agree.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"


def normalize_url(col) -> Column:
    """Canonical form of a URL column (unparseable rows pass through as
    trimmed strings — dedup then degrades to exact-string, never drops).

    Rules, applied in order:

    1. trim; strip the ``#fragment``;
    2. scheme and host lowercase;
    3. default port stripped (``:80`` for http, ``:443`` for https);
    4. tracking query parameters dropped (``TRACKING_PARAM_RE``);
    5. remaining query parameters sorted bytewise (order never changes
       content); an emptied query loses its ``?``;
    6. trailing slashes stripped from the path (root path becomes empty).
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(F.trim(c), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host0 = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.when(
        (scheme == "http") & host0.endswith(":80"),
        F.substring(host0, 1, F.length(host0) - 3),
    ).when(
        (scheme == "https") & host0.endswith(":443"),
        F.substring(host0, 1, F.length(host0) - 4),
    ).otherwise(host0)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        scheme == "", F.trim(c)  # unparseable: exact-string fallback
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, qpart))


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tiebreak_col: str | None = None,
    keep_canonical_col: str | None = "canonical_url",
) -> DataFrame:
    """Keep the newest capture per *canonical* URL.

    ``normalize_url`` keys the group; ``snapshot_dedup`` does the argmax
    (struct-max with map-side partial aggregation — one combine-reduced
    shuffle, no window sort; see its docstring for the 100 TB argument).
    The canonical key is returned as ``keep_canonical_col`` (None drops
    it)."""
    from .dedup import snapshot_dedup

    tagged = docs.withColumn("__canon", normalize_url(url_col))
    out = snapshot_dedup(tagged, key_col="__canon", ts_col=ts_col, tiebreak_col=tiebreak_col)
    if keep_canonical_col:
        return out.withColumnRenamed("__canon", keep_canonical_col)
    return out.drop("__canon")
