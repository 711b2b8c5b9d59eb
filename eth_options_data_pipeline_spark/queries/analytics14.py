"""Round-5 corpus faces: exact n-gram span dedup (dx47), time-series
gap-fill (dx48), and hard-negative mining (dx49).

dx47 is the Lee-et-al exact-substring detector
(operators/ngram_spans.py): a rolling 5-word-gram inverted index,
document-frequency gated, self-joined on digest, with
gaps-and-islands over (pair, diagonal) recovering each maximal
verbatim shared run. Output is integer-only (counts and word
lengths), so the oracle hash is exact with no float rounding
anywhere.

dx48 is calendar regularization (operators/gapfill.py): every
(user, day) in the observed range, with last-observation-carried-
forward AND linear interpolation between the bracketing
observations — the ``time_bucket_gapfill`` / ``resample().ffill()``
primitive a per-(symbol, day) snapshot pipeline needs when the feed
drops days (reference: the cumulative sheet assumes a row per day,
deltaweekly.py's daily append).

dx49 mines contrastive hard negatives: per anchor document, the most
cosine-similar documents from a different source below a near-dup
ceiling — the retrieval-training companion to dx43's RAG index.

dx50 is trailing-window z-score outlier detection
(operators/anomaly.py): integer-cents frame sums make the rolling
mean/variance exact in any accumulation order, so the cross-engine
stddev-drift problem never arises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.gapfill import gap_fill
from eth_options_data_pipeline_spark.operators.ngram_spans import (
    ngram_postings, span_dup_pairs,
)
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table

_N = 5          # words per gram
_MAX_DF = 20    # document-frequency gate: > this is boilerplate
_MIN_MATCHED = 3

_DX47_SQL = f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    ),
    grams AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             md5(array_to_string(w[pos:pos+{_N - 1}], ' ')) AS g
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w) - {_N - 1}, 0))) AS pos
            FROM docs)
    ),
    kept AS (
      SELECT g FROM grams GROUP BY g
      HAVING count(DISTINCT doc_id) BETWEEN 2 AND {_MAX_DF}
    ),
    occ AS (SELECT grams.* FROM grams JOIN kept USING (g)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
      FROM occ a JOIN occ b ON b.g = a.g AND a.doc_id < b.doc_id
    ),
    islands AS (
      SELECT doc_a, doc_b, pa - pb AS diag, pa,
             pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                     ORDER BY pa) AS island
      FROM pairs
    ),
    runs AS (
      SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS run
      FROM islands GROUP BY doc_a, doc_b, diag, island
    )
    SELECT doc_a, doc_b,
           CAST(sum(run) AS BIGINT) AS matched_grams,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(run) + {_N - 1} AS BIGINT) AS longest_run_words
    FROM runs GROUP BY doc_a, doc_b
    HAVING sum(run) >= {_MIN_MATCHED}
"""


@query("dx47_ngram_span_dups", sql=_DX47_SQL)
def dx47_ngram_span_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup: which document pairs share verbatim
    5-gram runs, how many, and how long the longest shared substring
    is. Digest-only shuffles; df-gated fan-out; per-(pair, diagonal)
    windows — the 100 TB-safe shape of suffix-array dedup."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    postings = ngram_postings(docs, n=_N)
    return span_dup_pairs(postings, n=_N,
                          min_matched=_MIN_MATCHED, max_df=_MAX_DF)


# ------------------------------------------------------ gap-fill (dx48)
#
# LOCF and linear interpolation come out of one grid join + one
# key-partitioned window sort, so both fill modes are hash-checked in
# one row. The lerp expression is written in the same
# left-to-right order on both engines (prev + (next-prev) * (d-prev_d)
# / (next_d-prev_d)) and rounded to 6 decimals, so IEEE doubles agree
# bit-for-bit.

_DX48_SQL = """
    WITH obs AS (
      SELECT user_id AS key, day, value AS obs_value FROM (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM events) WHERE rk = 1
    ),
    bounds AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
               FROM events),
    grid AS (
      SELECT u.key, CAST(unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT DISTINCT user_id AS key FROM events) u CROSS JOIN bounds b
    ),
    j AS (
      SELECT g.key, g.day, o.obs_value,
             CASE WHEN o.obs_value IS NOT NULL
                  THEN date_diff('day', DATE '1970-01-01', g.day) END AS od,
             date_diff('day', DATE '1970-01-01', g.day) AS d
      FROM grid g LEFT JOIN obs o USING (key, day)
    ),
    f AS (
      SELECT key, day, obs_value, d,
             last_value(obs_value IGNORE NULLS) OVER w_back AS prev_v,
             last_value(od IGNORE NULLS) OVER w_back AS prev_d,
             first_value(obs_value IGNORE NULLS) OVER w_fwd AS next_v,
             first_value(od IGNORE NULLS) OVER w_fwd AS next_d
      FROM j
      WINDOW
        w_back AS (PARTITION BY key ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_fwd AS (PARTITION BY key ORDER BY day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT key, strftime(day, '%Y-%m-%d') AS day,
           round(coalesce(prev_v, -1.0), 6) AS value_locf,
           round(CASE WHEN obs_value IS NOT NULL THEN obs_value
                      WHEN prev_v IS NULL THEN -1.0
                      WHEN next_v IS NULL THEN prev_v
                      ELSE prev_v + (next_v - prev_v) * (d - prev_d)
                                    / (next_d - prev_d)
                 END, 6) AS value_interp,
           CASE WHEN obs_value IS NOT NULL THEN 1 ELSE 0 END AS observed
    FROM f
"""


@query("dx48_gap_fill", sql=_DX48_SQL)
def dx48_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill over the events feed: one row per (user, day)
    in the global observed range, LOCF and linear-interpolated values
    side by side, observed-day flag. Grid = distinct keys x broadcast
    bounds; fills are per-key ignore-nulls windows — never a
    driver-side calendar loop."""
    ev = load_table(spark, sf_dir, "events")
    return gap_fill(ev).select(
        "key", F.date_format("day", "yyyy-MM-dd").alias("day"),
        "value_locf", "value_interp", "observed")


# ---------------------------------------------- hard negatives (dx49)
#
# Contrastive-training data mining: for each anchor document, the
# top-k most cosine-similar documents from a DIFFERENT source, with
# probable false negatives (sim above a ceiling, i.e. near-dups that
# slipped the dedup pass) excluded. Reuses dx43's integer feature-hash
# embedding, so every cosine input is exact on both engines; the
# ceiling and ranking compare the ROUNDED sim, so the cut is
# engine-independent.

_NEG_K = 5        # negatives per anchor
_NEG_NA = 5       # anchor-panel size (constant -> linear scan at scale)
_NEG_CEIL = 0.999  # sim ceiling: above this = probable unlabeled dup


def _neg_sql() -> str:
    from eth_options_data_pipeline_spark.operators import vectors as _vx
    from eth_options_data_pipeline_spark.queries.analytics13 import (
        _hash_embed_sql,
    )
    return f"""
    WITH emb AS (
      SELECT doc_id, source, {_hash_embed_sql('text')} AS e
      FROM documents
    ),
    corpus AS (SELECT * FROM emb WHERE list_dot_product(e, e) > 0),
    anchors AS (
      SELECT doc_id AS a_doc, source AS a_source, e AS ae
      FROM corpus
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {_NEG_NA}
    ),
    scored AS (
      SELECT a.a_doc, c.doc_id AS neg_doc, c.source AS neg_source,
             round({_vx.cosine_sql('c.e', 'a.ae')}, 6) AS sim
      FROM corpus c CROSS JOIN anchors a
      WHERE c.source <> a.a_source
    )
    SELECT a_doc, CAST(rk AS INT) AS rank, neg_doc, neg_source, sim
    FROM (
      SELECT *, row_number() OVER (PARTITION BY a_doc
                                   ORDER BY sim DESC, neg_doc) AS rk
      FROM scored WHERE sim <= {_NEG_CEIL})
    WHERE rk <= {_NEG_K}
    """


@query("dx49_hard_negatives", sql=_neg_sql())
def dx49_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor doc,
    the top-5 most-similar documents from a different source, capped
    below a similarity ceiling that screens out unlabeled duplicates
    (the standard false-negative filter). Anchor panel is a constant-
    size broadcast; the corpus side is one linear scan + per-anchor
    WindowGroupLimit top-k — the same shape as dx43, so the billion-doc
    path swaps in the vx05/vx04 candidate stages unchanged."""
    from pyspark.sql import Window
    from eth_options_data_pipeline_spark.operators import vectors as vx
    from eth_options_data_pipeline_spark.queries.analytics13 import _hash_embed

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    emb = docs.select("doc_id", "source",
                      _hash_embed(F.col("text")).alias("e"))
    # cached: the anchor-panel subtree (TakeOrdered 5) and the scoring
    # scan BOTH consume the embedded corpus, and the per-word md5 HOF
    # embed is the expensive half of this face — same move as dx10's
    # shingle cache
    from eth_options_data_pipeline_spark.operators import scratch
    corpus = scratch.scoped_cache(
        emb.where(vx.dot(F.col("e"), F.col("e")) > 0), "dx49")
    anchors = (
        corpus.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(_NEG_NA)
        .select(F.col("doc_id").alias("a_doc"),
                F.col("source").alias("a_source"),
                F.col("e").alias("ae"))
    )
    scored = (
        corpus.crossJoin(F.broadcast(anchors))
        .where(F.col("source") != F.col("a_source"))
        .select("a_doc", F.col("doc_id").alias("neg_doc"),
                F.col("source").alias("neg_source"),
                F.round(vx.cosine(F.col("e"), F.col("ae")), 6).alias("sim"))
        .where(F.col("sim") <= F.lit(_NEG_CEIL))
    )
    w = Window.partitionBy("a_doc").orderBy(F.col("sim").desc(), "neg_doc")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _NEG_K)
        .select("a_doc", F.col("rank").cast("int").alias("rank"),
                "neg_doc", "neg_source", "sim")
    )


# ------------------------------------------- rolling anomalies (dx50)
#
# Trailing-window z-score outliers (operators/anomaly.py). The frame
# aggregates are integer (cents) sums — exact in any accumulation
# order — so the only floats are the final mean/var/z expressions,
# written identically on both engines and rounded to 6 before the
# threshold cut.

_ANOM_LOOKBACK = 20
_ANOM_MINP = 10
_ANOM_THRESH = 2.5

_DX50_SQL = f"""
    WITH c AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    w AS (
      SELECT event_id, user_id, cents,
             count(*) OVER f AS cnt,
             sum(cents) OVER f AS s1,
             sum(cents * cents) OVER f AS s2
      FROM c
      WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_ANOM_LOOKBACK} PRECEDING AND 1 PRECEDING)
    ),
    z AS (
      SELECT event_id, user_id,
             round(CASE WHEN cnt >= {_ANOM_MINP} THEN
               (cents - s1 / cnt)
               / (CASE WHEN s2 / cnt - (s1 / cnt) * (s1 / cnt) > 0
                       THEN sqrt(s2 / cnt - (s1 / cnt) * (s1 / cnt)) END)
             END, 6) AS z
      FROM w
    )
    SELECT event_id, user_id, z FROM z WHERE abs(z) >= {_ANOM_THRESH}
"""


@query("dx50_rolling_anomaly", sql=_DX50_SQL)
def dx50_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided rolling outlier detection: events whose value sits
    >= 2.5 trailing standard deviations from their user's last-20
    mean. One shuffle on user, one ordered frame — the replayable
    batch face of a streaming quality gate."""
    from eth_options_data_pipeline_spark.operators.anomaly import (
        rolling_anomalies,
    )
    ev = load_table(spark, sf_dir, "events")
    return rolling_anomalies(ev, threshold=_ANOM_THRESH,
                             lookback=_ANOM_LOOKBACK,
                             min_periods=_ANOM_MINP)
