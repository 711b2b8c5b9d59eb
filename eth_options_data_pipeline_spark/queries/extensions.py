"""North-star extension corpus: dedup / text analysis / similarity /
event windows over the `documents`, `embeddings`, `events` tables.

These are the training-data-pipeline operators (BASELINE.json north
star): exact dedup, fingerprinting, token counting, quality scoring,
language-ID, embedding cosine top-k, tumbling/session windows. Each is
oracle-checked where ANSI-SQL-expressible; the probabilistic family
(MinHash-LSH, SimHash) lives in minhash.py with rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.dedup import duplicate_groups
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _any_eq(col, values):
    """col IN (values) as a chained OR — HOF-lambda-safe membership."""
    import functools
    import operator
    return functools.reduce(operator.or_, [col == F.lit(v) for v in values])


# ---------------------------------------------------------------------------
# Dedup / fingerprinting
# ---------------------------------------------------------------------------

@query(
    "dx01_exact_dup_groups",
    sql="""
    SELECT digest, count(*) AS n_dups, min(doc_id) AS canonical_id
    FROM (SELECT doc_id, md5(substr(text, 1, 40)) AS digest FROM documents)
    GROUP BY digest HAVING count(*) > 1
    """,
)
def dx01_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: duplicate clusters with a
    deterministic canonical representative (min id). The shuffle key is
    the 32-byte digest, not the document body — the property that makes
    this the 100 TB-safe dedup primitive. Clustering on a 40-char
    prefix digest so the synthetic corpus actually produces clusters."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("prefix")
    )
    return duplicate_groups(docs, content_cols=["prefix"], id_col="doc_id")


@query(
    "dx02_fingerprint",
    sql="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 8) AS bucket
    FROM documents
    """,
)
def dx02_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whitespace-normalized lowercase digest
    (the exact-dedup/dedup-audit key) + an 8-hex-char bucket prefix
    usable as a shard key."""
    docs = t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    fp = F.md5(norm)
    return docs.select("doc_id", fp.alias("fingerprint"),
                       F.substring(fp, 1, 8).alias("bucket"))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@query(
    "dx03_token_count",
    sql="""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_ish_tokens,
           length(text) AS n_chars_actual
    FROM documents
    """,
)
def dx03_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letter runs / digit runs / single punctuation). Pure codegen
    expressions — no Python in the hot path."""
    docs = t(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    ws = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    bpe = F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                      F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)))
    return docs.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_ish_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


@query(
    "dx04_quality_score",
    sql="""
    WITH feat AS (
      SELECT doc_id,
             length(text) AS n_chars_actual,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
             len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             x -> x IN ('the','a','and','of','to','in','is'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars_actual, n_words, n_punct, n_stop,
           CASE WHEN n_chars_actual = 0 THEN 0.0
                ELSE CAST(n_punct AS DOUBLE) / n_chars_actual END AS punct_ratio,
           CASE WHEN n_words = 0 THEN 0.0
                ELSE CAST(n_stop AS DOUBLE) / n_words END AS stop_ratio,
           (n_words >= 10 AND n_chars_actual >= 50
            AND CAST(n_punct AS DOUBLE) / greatest(n_chars_actual, 1) < 0.2) AS passes_quality
    FROM feat
    """,
)
def dx04_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation-ratio / stopword-ratio
    features + a boolean gate — the C4-style quality filter shape.
    Ratios are int/int divisions of identical operands, so bit-exact
    across engines without rounding."""
    docs = t(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    n_chars = F.length("text")
    n_words = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?,;:]"), F.lit(0)))
    stopwords = ["the", "a", "and", "of", "to", "in", "is"]
    # NB: Column.isin inside a higher-order-function lambda miscompiles
    # on Spark 4.1 (casts the lambda var to BIGINT); chained OR is safe.
    n_stop = F.size(F.filter(
        F.split(F.lower(trimmed), r"\s+"),
        lambda x: _any_eq(x, stopwords),
    ))
    feat = docs.select(
        "doc_id", n_chars.alias("n_chars_actual"), n_words.alias("n_words"),
        n_punct.alias("n_punct"), n_stop.alias("n_stop"),
    )
    punct_ratio = F.when(F.col("n_chars_actual") == 0, F.lit(0.0)).otherwise(
        F.col("n_punct").cast("double") / F.col("n_chars_actual")
    )
    stop_ratio = F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
        F.col("n_stop").cast("double") / F.col("n_words")
    )
    passes = (
        (F.col("n_words") >= 10) & (F.col("n_chars_actual") >= 50)
        & (F.col("n_punct").cast("double") / F.greatest(F.col("n_chars_actual"), F.lit(1)) < 0.2)
    )
    return feat.select(
        "doc_id", "n_chars_actual", "n_words", "n_punct", "n_stop",
        punct_ratio.alias("punct_ratio"), stop_ratio.alias("stop_ratio"),
        passes.alias("passes_quality"),
    )


_LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "les", "et"],
    "es": ["el", "los", "las", "y"],
    "zh": ["的", "是", "了"],
}


def _lang_sql_counts() -> str:
    parts = []
    for lang, words in _LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        parts.append(
            f"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),"
            f" x -> x IN ({lst}))) AS s_{lang}"
        )
    return ",\n             ".join(parts)


@query(
    "dx05_lang_id",
    sql=f"""
    WITH scored AS (
      SELECT doc_id, lang AS labeled_lang,
             {_lang_sql_counts()}
      FROM documents
    )
    SELECT doc_id, labeled_lang, s_en, s_de, s_fr, s_es, s_zh,
           CASE
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
             WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
             WHEN s_es >= s_zh THEN 'es'
             ELSE 'zh'
           END AS predicted_lang
    FROM scored
    """,
)
def dx05_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language stopword hit counts with a
    deterministic argmax (ties break in fixed language order). The
    synthetic corpus shares one vocabulary, so the heuristic's value is
    the operator shape, not label recovery."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    def _pred(sw):
        # NB: a single-parameter lambda is required — a second (default)
        # parameter makes F.filter pass the element *index* into it.
        return lambda x: _any_eq(x, sw)

    scores = {
        lang: F.size(F.filter(words, _pred(sw)))
        for lang, sw in _LANG_STOPWORDS.items()
    }
    scored = docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"),
        *[scores[lang].alias(f"s_{lang}") for lang in _LANG_STOPWORDS],
    )
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_STOPWORDS}
    predicted = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] >= s["zh"]), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] >= s["zh"]), "de")
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["zh"]), "fr")
        .when(s["es"] >= s["zh"], "es")
        .otherwise("zh")
    )
    return scored.select(
        "doc_id", "labeled_lang", "s_en", "s_de", "s_fr", "s_es", "s_zh",
        predicted.alias("predicted_lang"),
    )


# ---------------------------------------------------------------------------
# Vector similarity
# ---------------------------------------------------------------------------

@query(
    "vx01_cosine_topk",
    sql="""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id, label,
           round(list_dot_product(embedding::DOUBLE[], q.qe)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos_sim
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def vx01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline over array<float>
    embeddings: broadcast the query vector, JVM-side zip_with/aggregate
    dot products (no Python UDF), TakeOrderedAndProject for the top-k.
    At 100 TB this is the exact-rerank stage; vx02 adds the LSH-bucketed
    candidate-generation stage."""
    emb = t(spark, sf_dir, "embeddings").withColumn(
        "e", F.col("embedding").cast("array<double>")
    )
    qvec = emb.where(F.col("vec_id") == 0).select(F.col("e").alias("qe"))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)

    cand = emb.where(F.col("vec_id") != 0).crossJoin(F.broadcast(qvec))
    cos = dot(F.col("e"), F.col("qe")) / (
        F.sqrt(dot(F.col("e"), F.col("e"))) * F.sqrt(dot(F.col("qe"), F.col("qe")))
    )
    return (
        cand.select("vec_id", "label", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Event-time windows (batch faces of the streaming operators, §2.10)
# ---------------------------------------------------------------------------

@query(
    "sx01_tumbling_agg",
    sql="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def sx01_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate — the batch face of
    the streaming windowed agg (SURVEY §2.10). Uses date_trunc so the
    window key is engine-portable; the streaming variant uses
    window(ts, '1 hour') + watermark (streaming/stream.py)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "sx02_session_windows",
    sql="""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def sx02_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) via the islands pattern:
    lag -> new-session flag -> running sum as session id. The batch
    face of streaming session_window(ts, '30 minutes')."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros("ts")
    new_sess = F.when(
        micros - F.lag(micros).over(w) > 1800 * 1000 * 1000, F.lit(1)
    ).otherwise(F.lit(0))
    wsum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.withColumn("new_session", new_sess).withColumn(
        "session_id", F.sum("new_session").over(wsum)
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
