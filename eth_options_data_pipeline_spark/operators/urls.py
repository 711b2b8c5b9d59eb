"""URL canonicalization and keep-best-per-URL deduplication.

Web-crawl corpora (C4, CCNet pipelines) dedup by URL before any
content-level pass: the same page is fetched many times with varying
tracking parameters, fragments, and case in the scheme/host. This
operator normalizes URLs into a canonical key, entirely in JVM-side
expressions, then keeps the best row per key.

Canonicalization rules (applied in order):

1. scheme and host lowercased (path/query case is significant, kept)
2. fragment (``#...``) dropped
3. default ports stripped (``:80`` for http, ``:443`` for https)
4. tracking params dropped: ``utm_*``, ``gclid``, ``fbclid``, ``ref``
5. remaining query params sorted byte-wise (param order never
   distinguishes resources in practice)
6. trailing ``/`` dropped from a non-root path; empty path becomes
   ``/``

Scale shape: rules 1-3 and 6 are regexp/string expressions; rules
4-5 are split → higher-order filter → array_sort → array_join — all
per-row, JVM-side expression work, zero shuffles and zero Python.
``dedup_by_url`` then does ONE shuffle on the canonical key using a
max-of-struct aggregate (partial-aggregatable — map-side combine
keeps one candidate per key per partition before the exchange), not
a row_number window, so there is no per-key sort and a hot host's
duplicates collapse before they travel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _is_tracking(param: Column) -> Column:
    name = F.split(param, "=", 2)[0]
    return (name.startswith("utm_") | (name == "gclid")
            | (name == "fbclid") | (name == "ref"))


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` (see module docstring); NULL when the
    value has no ``scheme://`` prefix — a guessed canonical form would
    silently merge distinct garbage rows."""
    u = F.regexp_replace(url, r"#.*$", "")              # 2: fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    host = (
        F.when((scheme == "http") & hostport.endswith(":80"),
               F.regexp_replace(hostport, r":80$", ""))
        .when((scheme == "https") & hostport.endswith(":443"),
              F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport))                            # 1 + 3
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$", 1)
    raw_path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = (
        F.when(raw_path == "", F.lit("/"))
        .when((F.length(raw_path) > 1) & raw_path.endswith("/"),
              raw_path.substr(F.lit(1), F.length(raw_path) - 1))
        .otherwise(raw_path))                            # 6
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(F.split(query, "&"),
                      lambda p: (p != "") & ~_is_tracking(p))
    qcanon = F.array_join(F.array_sort(params), "&")     # 4 + 5
    return F.when(
        url.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"),
        F.concat(scheme, F.lit("://"), host, path,
                 F.when(qcanon == "", F.lit(""))
                 .otherwise(F.concat(F.lit("?"), qcanon))))


def dedup_by_url(df: DataFrame, url_col: str, quality_col: str,
                 tiebreak_col: str) -> DataFrame:
    """One row per canonical URL: highest ``quality_col`` wins, ties
    broken by smallest ``tiebreak_col``. Rows with un-canonicalizable
    URLs (no scheme) pass through untouched."""
    with_key = df.withColumn("canonical_url",
                             canonical_url(F.col(url_col)))
    bad = with_key.where(F.col("canonical_url").isNull()).drop("canonical_url")
    good = with_key.where(F.col("canonical_url").isNotNull())
    # max over a struct: quality desc then tiebreak asc (negated),
    # payload last — one mergeable agg picks the winner per key
    choice = F.struct(
        F.col(quality_col).alias("q"),
        (-F.col(tiebreak_col)).alias("negtb"),
        F.struct(*[F.col(c) for c in df.columns]).alias("row"))
    best = (
        good.groupBy("canonical_url")
        .agg(F.max(choice).alias("best"))
        .select("best.row.*")
    )
    return best.unionByName(bad)
