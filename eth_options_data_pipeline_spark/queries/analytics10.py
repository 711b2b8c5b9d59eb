"""Round-4 corpus wave 3: driver-checked faces for graph rank,
dataset mixing, chunking, snapshot diff, per-group quantile gating,
keyless range join, and the corpus data card.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.chunking import chunk_documents
from eth_options_data_pipeline_spark.operators.corpus_diff import snapshot_diff
from eth_options_data_pipeline_spark.operators.datacard import corpus_datacard
from eth_options_data_pipeline_spark.operators.mixing import mix_sources
from eth_options_data_pipeline_spark.operators.pagerank import pagerank
from eth_options_data_pipeline_spark.operators.ranges import point_in_interval_join
from eth_options_data_pipeline_spark.operators.thresholds import quantile_gate_exact
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------- pagerank

_PR_ITERS = 3
_PR_D = 0.85


def _pagerank_sql() -> str:
    """Unrolled 3-iteration PageRank with dangling-mass redistribution,
    over the supplier->part bipartite edge list (all part nodes are
    dangling, so the redistribution path is genuinely exercised)."""
    head = f"""
    WITH edges AS (
      SELECT DISTINCT l_suppkey AS src, -l_partkey - 1 AS dst FROM lineitem
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
    ),
    deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)
    """
    body = []
    for k in range(_PR_ITERS):
        body.append(f"""
    d{k} AS (
      SELECT coalesce(sum(rank), 0) AS dang FROM r{k}
      WHERE node NOT IN (SELECT src FROM deg)
    ),
    c{k} AS (
      SELECT e.dst AS node, sum(r.rank / g.out_deg) AS mass
      FROM r{k} r JOIN deg g ON g.src = r.node JOIN edges e ON e.src = r.node
      GROUP BY e.dst
    ),
    r{k + 1} AS (
      SELECT n2.node,
             ({1.0 - _PR_D} / (SELECT n FROM nn))
             + {_PR_D} * (SELECT dang FROM d{k}) / (SELECT n FROM nn)
             + {_PR_D} * coalesce(c.mass, 0) AS rank
      FROM nodes n2 LEFT JOIN c{k} c ON c.node = n2.node
    )""")
    return (head + "," + ",".join(body)
            + f"\n    SELECT node, round(rank, 9) AS rank FROM r{_PR_ITERS}")


@query("dx28_pagerank", sql=_pagerank_sql())
def dx28_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, damping 0.85) over the supplier->part
    link graph: one iteration = join ranks to edges + map-side-
    combinable groupBy(dst); dangling mass is one tiny scalar per
    round (operators/pagerank.py). Ranks rounded to 9 (sum-order
    noise ~1e-16). Part nodes are sign-flipped (-partkey - 1) so the
    two id spaces can never collide at ANY scale factor — suppkeys are
    strictly positive, part nodes strictly negative (an additive
    offset silently merged supplier and part nodes once suppkey
    exceeded it)."""
    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (-F.col("l_partkey") - 1).alias("dst"),
    ).distinct()
    out = pagerank(edges, iters=_PR_ITERS, damping=_PR_D,
                   scratch_key="dx28")
    return out.select("node", F.round("rank", 9).alias("rank"))


# ----------------------------------------------------------- mixing

def _h01_sql(seed: str, key: str) -> str:
    """sampling/mixing _hash01 twin: 13 hex chars of md5 / 2^52."""
    return (f"CAST(('0x' || substr(md5('{seed}|' || {key}), 1, 13)) AS BIGINT)"
            f" / 4503599627370496.0")


_MIX_SQL = f"""
    WITH en AS (
      SELECT doc_id,
             1 + CASE WHEN {_h01_sql('mix|en', 'CAST(doc_id AS VARCHAR)')} < 0.7
                      THEN 1 ELSE 0 END AS n_copies
      FROM documents WHERE lang = 'en'
    ),
    rest AS (
      SELECT doc_id, 1 AS n_copies
      FROM documents WHERE lang <> 'en'
        AND {_h01_sql('mix|rest', 'CAST(doc_id AS VARCHAR)')} < 0.6
    )
    SELECT doc_id, CAST(unnest(range(0, n_copies)) AS INT) AS mix_copy,
           'en' AS mix_source FROM en
    UNION ALL
    SELECT doc_id, CAST(unnest(range(0, n_copies)) AS INT) AS mix_copy,
           'rest' AS mix_source FROM rest
"""


@query("dx29_mixing", sql=_MIX_SQL)
def dx29_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataset mixing: 'en' at weight 1.7 (every row
    once, a seeded-hash 70% slice twice), the rest at 0.6 — integer
    repeats via in-row explode(sequence), fractional parts via
    md5(seed|id), byte-reproducible across runs and engines
    (operators/mixing.py)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = mix_sources(
        {
            "en": (docs.where(F.col("lang") == "en").select("doc_id"), 1.7),
            "rest": (docs.where(F.col("lang") != "en").select("doc_id"), 0.6),
        },
        id_col="doc_id",
    )
    return out.select("doc_id", "mix_copy", "mix_source")


# --------------------------------------------------------- chunking

_CT, _OV = 12, 4  # chunk_tokens, overlap -> stride 8

_CHUNK_SQL = f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
      FROM documents
    ),
    p AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) > {_CT}
                  THEN CAST(ceil((len(ws) - {_CT}) / {_CT - _OV}.0) AS BIGINT)
                  ELSE 0 END AS extra
      FROM w
    ),
    s AS (
      SELECT doc_id, ws,
             CAST(unnest(range(0, extra + 1)) AS INT) AS chunk_index
      FROM p
    )
    SELECT doc_id,
           doc_id || '#' || chunk_index AS chunk_id,
           chunk_index,
           array_to_string(ws[chunk_index*{_CT - _OV}+1 : chunk_index*{_CT - _OV}+{_CT}], ' ')
             AS chunk_text,
           len(ws[chunk_index*{_CT - _OV}+1 : chunk_index*{_CT - _OV}+{_CT}]) AS n_tokens
    FROM s
"""


@query("dx30_chunking", sql=_CHUNK_SQL)
def dx30_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: overlapping 12-token windows with
    stride 8 and stable chunk ids, placed per-row by a sequence
    explode — chunk boundaries are a pure function of the token
    count (operators/chunking.py)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs, chunk_tokens=_CT, overlap=_OV)


# ----------------------------------------------------- snapshot diff

_DIFF_SQL = """
    WITH old AS (SELECT doc_id, text FROM documents),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 17 <> 0
      UNION ALL
      SELECT doc_id + 100000, 'fresh doc ' || doc_id
      FROM documents WHERE doc_id % 23 = 0
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.text <> n.text THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old o FULL JOIN new n ON n.doc_id = o.doc_id
"""


@query("dx31_snapshot_diff", sql=_DIFF_SQL)
def dx31_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff between two pipeline runs: each side
    collapses to (id, md5 digest) BEFORE one full-outer join — bodies
    never shuffle; same-bytes re-lands stay 'unchanged'
    (operators/corpus_diff.py). The new snapshot is derived
    deterministically (drop %17, rewrite %5, add %23)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    kept = docs.where(did % 17 != 0).select(
        "doc_id",
        F.when(did % 5 == 0, F.concat(F.col("text"), F.lit(" v2")))
         .otherwise(F.col("text")).alias("text"),
    )
    added = docs.where(did % 23 == 0).select(
        (did + 100000).alias("doc_id"),
        F.concat(F.lit("fresh doc "), did.cast("string")).alias("text"),
    )
    return snapshot_diff(docs, kept.unionByName(added))


# ---------------------------------------------------- quantile gate

_KEEP = 0.2

_GATE_SQL = f"""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
    FROM lineitem
    QUALIFY percent_rank() OVER (PARTITION BY l_returnflag
                                 ORDER BY l_extendedprice ASC) >= {1.0 - _KEEP}
"""


@query("dx32_quantile_gate", sql=_GATE_SQL)
def dx32_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quality bar: keep the top 20% of rows per group by
    score (C4/Gopher-style per-source thresholds). This is the exact
    percent_rank face; the scale path (approx per-group threshold,
    broadcast back) is pinned against it in tests/test_thresholds.py
    (operators/thresholds.py)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    return quantile_gate_exact(li, "l_returnflag", "l_extendedprice", _KEEP)


# ------------------------------------------------------- range join

_DAY0 = 1704067200  # epoch of 2024-01-01 (events span Jan 2024)

_RANGE_SQL = f"""
    WITH pts AS (
      SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS pt FROM events
    ),
    iv AS (
      SELECT CAST(unnest(range(0, 30)) AS INT) AS interval_id
    ),
    iv2 AS (
      SELECT interval_id,
             {_DAY0} + interval_id * 86400 + 32400 AS s,
             {_DAY0} + interval_id * 86400 + 43200 AS e
      FROM iv
    )
    SELECT p.event_id, i.interval_id
    FROM pts p JOIN iv2 i ON p.pt BETWEEN i.s AND i.e
"""


@query("dx33_range_join", sql=_RANGE_SQL)
def dx33_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless point-in-interval join (events x daily 09:00-12:00
    maintenance windows) via bucketization: both sides bucket on
    floor(ts / width), intervals explode across spanned buckets, and
    the join becomes an equi-join Catalyst can hash — never a
    BroadcastNestedLoopJoin (operators/ranges.py)."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("long").alias("pt"))
    iv = spark.range(30).select(
        F.col("id").cast("int").alias("interval_id"),
        (F.lit(_DAY0) + F.col("id") * 86400 + 32400).alias("s"),
        (F.lit(_DAY0) + F.col("id") * 86400 + 43200).alias("e"),
    )
    joined = point_in_interval_join(ev, iv, "pt", "s", "e", bucket=86400)
    return joined.select("event_id", "interval_id")


# --------------------------------------------------------- datacard

# planted email (every even doc) + 6-word sentence chunking give the
# PII and repetition columns real signal; '. ' boundaries make the
# lookbehind segment split replayable in RE2 via the replace trick
_DC_WS = "regexp_split_to_array(trim(text), '\\s+')"
_DC_TEXT2 = (
    f"array_to_string(list_transform(range(0, CAST(ceil(len({_DC_WS}) / 6.0) AS INT)), "
    f"g -> array_to_string({_DC_WS}[g*6+1 : g*6+6], ' ')), '. ')"
    " || CASE WHEN doc_id % 2 = 0"
    " THEN ' contact user' || doc_id || '@mail.example.org' ELSE '' END"
)

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_DATACARD_SQL = f"""
    WITH d AS (SELECT doc_id, source, lang, {_DC_TEXT2} AS text2 FROM documents),
    per_doc AS (
      SELECT source, lang,
             length(text2) AS n_chars,
             CASE WHEN length(trim(text2)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text2), '\\s+')) END AS n_words,
             CASE WHEN len(regexp_extract_all(text2, '{_EMAIL_RE}')) > 0
                  THEN 1 ELSE 0 END AS has_email,
             CASE WHEN len(list_filter(regexp_split_to_array(
                         replace(text2, '. ', '.' || chr(1)), chr(1)),
                         x -> len(x) > 0))
                  > len(list_distinct(list_filter(regexp_split_to_array(
                         replace(text2, '. ', '.' || chr(1)), chr(1)),
                         x -> len(x) > 0)))
                  THEN 1 ELSE 0 END AS has_repeat
      FROM d
    )
    SELECT coalesce(source, '<all>') AS source,
           coalesce(lang, '<all>') AS lang,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           round(avg(has_email), 6) AS pii_email_rate,
           round(avg(has_repeat), 6) AS repeat_doc_rate
    FROM per_doc
    GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
"""


@query("dx34_datacard", sql=_DATACARD_SQL)
def dx34_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data card: per-(source, lang) + rolled-up counts, token
    mass, PII and repetition prevalence in ONE grouping-sets scan —
    every statistic a mergeable aggregate (operators/datacard.py).
    The approx sketch columns (percentiles, HLL uniques) are dropped
    from this face; qx28 checks sketch guarantees."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    sent = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(ws) / 6.0).cast("int") - 1),
        lambda g: F.array_join(F.slice(ws, g * 6 + 1, 6), " "),
    )
    did = F.col("doc_id")
    text2 = F.concat(
        F.array_join(sent, ". "),
        F.when(did % 2 == 0, F.concat(
            F.lit(" contact user"), did.cast("string"),
            F.lit("@mail.example.org"))).otherwise(F.lit("")),
    )
    card = corpus_datacard(
        docs.select("doc_id", "source", "lang", text2.alias("text")))
    return card.select(
        "source", "lang", "n_docs", "n_tokens", "n_chars",
        F.round("pii_email_rate", 6).alias("pii_email_rate"),
        F.round("repeat_doc_rate", 6).alias("repeat_doc_rate"),
    )
