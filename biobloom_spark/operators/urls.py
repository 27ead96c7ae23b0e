"""URL canonicalization + canonical-URL dedup.

Stage-1 dedup of every web-corpus pipeline: the same page is captured
under cosmetically different URLs (scheme/host case, default ports,
fragments, tracking parameters, trailing slashes, query-parameter
order, percent-encoding case), so recrawl dedup must key on a
*canonical* form, not the raw string.  No bcgsc/biobloom counterpart
(genomic reads have no URLs) — this complements ``dedup.snapshot_dedup``
(keep-newest per key) with the key normalization it needs on real crawl
data.

Everything is a pure JVM expression chain (regexp + higher-order list
ops), deterministic, and exactly reproducible by a SQL twin — the
normalization rules are the contract, stated once in ``normalize_url``
and mirrored pattern-for-pattern in the gate oracle and the fuzz-parity
test's Python reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["TRACKING_PARAM_RE", "normalize_url", "url_dedup"]

#: Query parameters dropped during canonicalization — only unambiguous
#: click/analytics IDs that never change page content (``ref`` and
#: friends are content-bearing routing parameters on many sites and are
#: deliberately NOT here).  Anchored full-parameter match; the value part
#: (``=...``) is optional so bare occurrences (``?utm_source``)
#: canonicalize the same as valued ones.  ASCII-only so Java regex and
#: RE2 agree.  Callers with site-specific knowledge pass their own
#: pattern via ``normalize_url(..., tracking_param_re=...)``.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid)(=.*)?$"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"


def _upper_pct(c: Column) -> Column:
    """Uppercase the hex digits of every ``%hh`` percent-escape (RFC 3986
    §6.2.2.1: ``%7e`` and ``%7E`` are the same octet; the canonical form
    is uppercase).  Pure JVM: lookahead-split at each ``%``, uppercase the
    3-char escape head of parts that carry one, rejoin.  Sequences that
    are not valid escapes (``%zz``, trailing ``%``) pass through
    unchanged."""
    parts = F.split(c, r"(?=%)")
    return F.array_join(
        F.transform(
            parts,
            lambda p: F.when(
                p.rlike(r"^%[0-9a-fA-F]{2}"),
                F.concat(
                    F.upper(p.substr(F.lit(1), F.lit(3))),
                    p.substr(F.lit(4), F.length(p)),
                ),
            ).otherwise(p),
        ),
        "",
    )


def normalize_url(col, tracking_param_re: str = TRACKING_PARAM_RE) -> Column:
    """Canonical form of a URL column (unparseable rows — no scheme, or a
    scheme with an empty authority like ``file:///x`` or ``http://`` —
    pass through as trimmed strings, so dedup degrades to exact-string
    and never drops or cross-merges them).

    Rules, applied in order:

    1. trim; strip the ``#fragment``;
    2. scheme lowercase; host:port lowercase — but any ``userinfo@``
       prefix of the authority keeps its case (RFC 3986 §3.2.1: userinfo
       is case-sensitive);
    3. default port stripped (``:80`` for http, ``:443`` for https);
    4. tracking query parameters dropped (``tracking_param_re``, default
       ``TRACKING_PARAM_RE``; matched with or without an ``=value``);
    5. percent-escape hex uppercased in path and query (``%7e`` → ``%7E``);
    6. remaining query parameters sorted bytewise (order never changes
       content); an emptied query loses its ``?``;
    7. trailing slashes stripped from the path (root path becomes empty).
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(F.trim(c), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    # userinfo (case-preserved) split from host:port at the LAST '@'
    userinfo = F.regexp_extract(auth, r"^(.*)@", 1)
    hostport = F.lower(F.regexp_replace(auth, r"^.*@", ""))
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)
    host = F.when(userinfo == "", hostport).otherwise(
        F.concat(userinfo, F.lit("@"), hostport)
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
    path = _upper_pct(F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", ""))
    query = _upper_pct(F.regexp_extract(rest, r"\?(.*)$", 1))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(tracking_param_re),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        (scheme == "") | (auth == ""), F.trim(c)  # unparseable: exact-string fallback
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
    it); a pre-existing column of that name is an error — renaming over
    it would leave two identically named columns and poison every later
    ``select``."""
    from .dedup import snapshot_dedup

    if keep_canonical_col and keep_canonical_col in docs.columns:
        raise ValueError(
            f"docs already has a column named {keep_canonical_col!r}; "
            "pass keep_canonical_col=<other name> or None"
        )
    tagged = docs.withColumn("__canon", normalize_url(url_col))
    out = snapshot_dedup(tagged, key_col="__canon", ts_col=ts_col, tiebreak_col=tiebreak_col)
    if keep_canonical_col:
        return out.withColumnRenamed("__canon", keep_canonical_col)
    return out.drop("__canon")
