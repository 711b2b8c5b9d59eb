"""North-star extension corpus: dedup / text analysis / event windows
over the `documents` and `events` tables.

These are the training-data-pipeline operators (BASELINE.json north
star): exact dedup, fingerprinting, token counting, quality scoring,
language-ID, tumbling/sliding windows. Each is oracle-checked; the
probabilistic family (MinHash-LSH, SimHash, ANN) lives in fuzzy.py.

Round-2 consolidation: the per-document row-wise features (former
dx02_fingerprint, dx03_token_count, dx04_quality_score, dx05_lang_id,
dx09_normalize_text, q33_string_funcs) share one row base — one row per
document, zero shuffles — so they are now ONE battery query,
``dx02_doc_features``, keeping every facet oracle-checked while leaving
registry slots for the driver's 50-query correctness budget. Same for
the event-window batch faces (former sx01_tumbling_agg +
sx03_sliding_window -> ``sx01_windowed_aggs``).
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
# Dedup
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


# ---------------------------------------------------------------------------
# Per-document feature battery (fingerprint / tokens / quality / lang-id /
# normalization / string functions)
# ---------------------------------------------------------------------------

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


_NORM = ("trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
         " ' +', ' ', 'g'))")

_DOC_FEATURES_SQL = f"""
    WITH feat AS (
      SELECT doc_id, text, lang, source,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
             length(text) AS n_chars_actual,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_ish_tokens,
             len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             x -> x IN ('the','a','and','of','to','in','is'))) AS n_stop,
             {_lang_sql_counts()},
             {_NORM} AS norm_text
      FROM documents
    )
    SELECT doc_id,
           fingerprint,
           substr(fingerprint, 1, 8) AS bucket,
           n_chars_actual, n_words, bpe_ish_tokens, n_punct, n_stop,
           CASE WHEN n_chars_actual = 0 THEN 0.0
                ELSE CAST(n_punct AS DOUBLE) / n_chars_actual END AS punct_ratio,
           CASE WHEN n_words = 0 THEN 0.0
                ELSE CAST(n_stop AS DOUBLE) / n_words END AS stop_ratio,
           (n_words >= 10 AND n_chars_actual >= 50
            AND CAST(n_punct AS DOUBLE) / greatest(n_chars_actual, 1) < 0.2) AS passes_quality,
           lang AS labeled_lang, s_en, s_de, s_fr, s_es, s_zh,
           CASE
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
             WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
             WHEN s_es >= s_zh THEN 'es'
             ELSE 'zh'
           END AS predicted_lang,
           norm_text, length(norm_text) AS norm_len,
           lpad(CAST(doc_id AS VARCHAR), 8, '0')  AS padded_key,
           upper(source)                          AS src_upper,
           translate(source, '_', '-')            AS src_dashed,
           left(text, 10)                         AS text_prefix,
           reverse(left(text, 10))                AS text_rev,
           instr(lower(text), 'the')              AS the_at,
           concat_ws('/', lang, source)           AS lang_src,
           length(text) - length(replace(text, ' ', '')) AS n_spaces
    FROM feat
    """


@query("dx02_doc_features", sql=_DOC_FEATURES_SQL)
def dx02_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document feature battery — one narrow, shuffle-free projection
    computing every row-wise text feature in a single pass (the shape a
    100 TB pre-processing stage wants: scan once, derive everything):

    * fingerprint + shard bucket: whitespace-normalized lowercase md5
      (former dx02_fingerprint);
    * token counting: whitespace tokens + BPE-ish regex segmentation
      (former dx03_token_count);
    * quality scoring: length / punct-ratio / stopword-ratio features
      with a C4-style boolean gate — ratios are int/int divisions of
      identical operands, bit-exact across engines (former
      dx04_quality_score);
    * language-ID heuristic: per-language stopword hit counts with a
      deterministic argmax (former dx05_lang_id);
    * text normalization: lowercase, strip non-alphanumerics, collapse
      whitespace (former dx09_normalize_text);
    * string-function battery: pad / case / translate / slice / reverse
      / locate / concat_ws / occurrence-count (former q33_string_funcs).

    All pure codegen expressions — no Python, no shuffle."""
    docs = t(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    norm_ws = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    fp = F.md5(norm_ws)
    n_chars = F.length("text")
    n_words = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    bpe = F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                      F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?,;:]"), F.lit(0)))
    stopwords = ["the", "a", "and", "of", "to", "in", "is"]
    words = F.split(F.lower(trimmed), r"\s+")
    # NB: Column.isin inside a higher-order-function lambda miscompiles
    # on Spark 4.1 (casts the lambda var to BIGINT); chained OR is safe.
    n_stop = F.size(F.filter(words, lambda x: _any_eq(x, stopwords)))

    def _pred(sw):
        # single-parameter lambda: a second (default) parameter would
        # make F.filter pass the element *index* into it
        return lambda x: _any_eq(x, sw)

    lang_scores = {
        lang: F.size(F.filter(words, _pred(sw)))
        for lang, sw in _LANG_STOPWORDS.items()
    }
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "))

    feat = docs.select(
        "doc_id", "text", "lang", "source",
        fp.alias("fingerprint"),
        n_chars.alias("n_chars_actual"), n_words.alias("n_words"),
        bpe.alias("bpe_ish_tokens"), n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
        *[lang_scores[lang].alias(f"s_{lang}") for lang in _LANG_STOPWORDS],
        norm.alias("norm_text"),
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
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_STOPWORDS}
    predicted = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] >= s["zh"]), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] >= s["zh"]), "de")
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["zh"]), "fr")
        .when(s["es"] >= s["zh"], "es")
        .otherwise("zh")
    )
    return feat.select(
        "doc_id", "fingerprint",
        F.substring("fingerprint", 1, 8).alias("bucket"),
        "n_chars_actual", "n_words", "bpe_ish_tokens", "n_punct", "n_stop",
        punct_ratio.alias("punct_ratio"), stop_ratio.alias("stop_ratio"),
        passes.alias("passes_quality"),
        F.col("lang").alias("labeled_lang"),
        "s_en", "s_de", "s_fr", "s_es", "s_zh",
        predicted.alias("predicted_lang"),
        "norm_text", F.length("norm_text").alias("norm_len"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_key"),
        F.upper("source").alias("src_upper"),
        F.translate("source", "_", "-").alias("src_dashed"),
        F.substring("text", 1, 10).alias("text_prefix"),
        F.reverse(F.substring("text", 1, 10)).alias("text_rev"),
        F.instr(F.lower(F.col("text")), "the").alias("the_at"),
        F.concat_ws("/", "lang", "source").alias("lang_src"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).alias("n_spaces"),
    )


# ---------------------------------------------------------------------------
# Event-time windows (batch faces of the streaming operators, §2.10)
# ---------------------------------------------------------------------------

@query(
    "sx01_windowed_aggs",
    sql="""
    SELECT 'tumbling_1h' AS kind,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding_2h_1h', strftime(ws, '%Y-%m-%d %H:%M:%S'), event_type,
           count(*), round(sum(value), 2)
    FROM (
      SELECT unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
             event_type, value
      FROM events
    ) GROUP BY 2, 3
    """,
)
def sx01_windowed_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour + sliding 2h/1h event-time window aggregates —
    the batch faces of the streaming windowed aggs (SURVEY §2.10;
    streaming faces: streaming/stream.py hourly_event_counts /
    sliding_event_counts). date_trunc keys keep the window engine-
    portable; the sliding face expands each event to exactly
    window/slide = 2 rows, the same Expand shape Spark's window()
    generates. Former sx01_tumbling_agg + sx03_sliding_window."""
    ev = t(spark, sf_dir, "events")
    tumbling = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.lit("tumbling_1h").alias("kind"), "window_start", "event_type",
                "cnt", "sum_value")
    )
    trunc = F.date_trunc("hour", F.col("ts"))
    ws = F.explode(F.array(trunc, trunc - F.expr("INTERVAL 1 HOUR"))).alias("ws")
    sliding = (
        ev.select(ws, "event_type", "value")
        .groupBy(F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.lit("sliding_2h_1h").alias("kind"), "window_start", "event_type",
                "cnt", "sum_value")
    )
    return tumbling.unionByName(sliding)


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
