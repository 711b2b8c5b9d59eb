"""Round-5 corpus faces: exact n-gram span dedup (dx47) and
time-series gap-fill (dx48).

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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.gapfill import (
    gap_fill_interpolate, gap_fill_locf,
)
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
# LOCF and linear interpolation share the same grid join; the face
# joins the two operator outputs on (key, day) so both fill modes are
# hash-checked in one row. The lerp expression is written in the same
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
    locf = gap_fill_locf(ev)
    interp = gap_fill_interpolate(ev).select(
        "key", "day", "value_interp")
    return (
        locf.join(interp, ["key", "day"])
        .select("key", F.date_format("day", "yyyy-MM-dd").alias("day"),
                "value_locf", "value_interp", "observed")
    )
