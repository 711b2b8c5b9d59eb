"""URL canonicalization vs a Python replica of the same rules, and
keep-best-per-URL dedup semantics (winner choice, pass-through of
schemeless rows, single-exchange plan)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.urls import (
    canonical_url, dedup_by_url)


def _replica(url: str):
    if not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", url):
        return None
    u = re.sub(r"#.*$", "", url)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?]*)(.*)$", u)
    scheme, hostport, rest = m.group(1).lower(), m.group(2).lower(), m.group(3)
    if scheme == "http" and hostport.endswith(":80"):
        hostport = hostport[:-3]
    if scheme == "https" and hostport.endswith(":443"):
        hostport = hostport[:-4]
    path = re.match(r"^([^?]*)", rest).group(1)
    if path == "":
        path = "/"
    elif len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    qm = re.search(r"\?(.*)$", rest)
    params = []
    for p in (qm.group(1).split("&") if qm else []):
        name = p.split("=", 1)[0]
        if p and not (name.startswith("utm_")
                      or name in ("gclid", "fbclid", "ref")):
            params.append(p)
    q = "&".join(sorted(params))
    return f"{scheme}://{hostport}{path}" + (f"?{q}" if q else "")


URLS = [
    "http://Example.COM:80/path/?utm_source=x&b=2&a=1#frag",
    "https://Site.com:443/",
    "https://site.com",
    "http://site.com:8080/x/",
    "https://a.b/p?utm_campaign=1&utm_medium=2",
    "https://a.b/p?z=1&gclid=abc&y=2&ref=rss",
    "HTTPS://UPPER.example/CasePath?B=1&a=2",
    "http://h/?&&a=1",
    "ftp://files.example:21/pub/",
    "example.com/no-scheme",
    "not a url",
]


def test_canonical_matches_replica(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    got = {r.url: r.c for r in
           df.select("url", canonical_url(F.col("url")).alias("c")).collect()}
    for u in URLS:
        assert got[u] == _replica(u), u


def test_variants_collapse_to_one_key(spark):
    variants = [
        "http://example.com/a?x=1&y=2",
        "HTTP://EXAMPLE.com:80/a/?y=2&x=1#top",
        "http://example.com/a?utm_source=s&y=2&x=1",
    ]
    df = spark.createDataFrame([(u,) for u in variants], ["url"])
    keys = df.select(canonical_url(F.col("url")).alias("c")).distinct().collect()
    assert len(keys) == 1
    assert keys[0].c == "http://example.com/a?x=1&y=2"


def test_dedup_keeps_best_and_passes_schemeless(spark):
    rows = [
        (1, "http://example.com/a?x=1", 0.5, "low"),
        (2, "HTTP://example.com:80/a/?x=1", 0.9, "hi"),
        (3, "http://example.com/a?x=1&utm_source=s", 0.9, "hi-dup"),
        (4, "https://other.com/b", 0.1, "only"),
        (5, "no-scheme-here", 0.0, "passthrough"),
    ]
    df = spark.createDataFrame(rows, ["id", "url", "quality", "tag"])
    out = {r.id: r for r in
           dedup_by_url(df, "url", "quality", "id").collect()}
    # ids 1-3 share a canonical key; quality ties 2 vs 3, smaller id wins
    assert set(out) == {2, 4, 5}
    assert out[2].tag == "hi"


def test_dedup_plan_one_exchange_no_window(spark):
    df = spark.createDataFrame(
        [(i, f"http://h/{i % 3}", float(i), "t") for i in range(20)],
        ["id", "url", "quality", "tag"])
    plan = dedup_by_url(df, "url", "quality", "id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan
