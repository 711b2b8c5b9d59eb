"""Round-4 corpus wave 4: LM perplexity scoring and exact heavy
hitters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.heavy_hitters import heavy_hitters
from eth_options_data_pipeline_spark.operators.lm_quality import (
    score_perplexity,
    train_bigram_lm,
)
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------------- perplexity

# Stupid Backoff (Brants et al. 2007): S(w2|w1) = c_bg/c_w1 if seen,
# else alpha * c_uni / N, else the OOV floor. BOS = chr(2) so a
# k-word doc is scored over exactly k events. Train slice: %3 != 0;
# scoring covers the whole corpus so the backoff paths fire.
_PPL_SQL = """
    WITH tw AS (
      SELECT list_prepend(chr(2), regexp_split_to_array(lower(trim(text)), '\\s+')) AS ws
      FROM documents WHERE doc_id % 3 <> 0
    ),
    tokens AS (SELECT unnest(ws) AS w FROM tw),
    uni AS (SELECT w AS w2, count(*) AS c_uni FROM tokens GROUP BY w),
    tb AS (
      SELECT unnest(list_transform(range(1, len(ws)),
                    i -> {'w1': ws[i], 'w2': ws[i+1]})) AS bg
      FROM tw
    ),
    big AS (SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS c_bg FROM tb GROUP BY 1, 2),
    w1c AS (SELECT w1, sum(c_bg) AS c_w1 FROM big GROUP BY w1),
    big2 AS (SELECT big.w1, big.w2, c_bg, c_w1 FROM big JOIN w1c ON w1c.w1 = big.w1),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tokens WHERE w <> chr(2)),
    dw AS (
      SELECT doc_id,
             list_prepend(chr(2), regexp_split_to_array(lower(trim(text)), '\\s+')) AS ws
      FROM documents
    ),
    db0 AS (
      SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                            i -> {'w1': ws[i], 'w2': ws[i+1]})) AS bg
      FROM dw
    ),
    db AS (
      SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2, count(*) AS n
      FROM db0 GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT db.doc_id, db.n,
             CASE WHEN big2.c_bg IS NOT NULL THEN big2.c_bg / CAST(big2.c_w1 AS DOUBLE)
                  WHEN uni.c_uni IS NOT NULL THEN 0.4 * uni.c_uni / (SELECT total FROM nn)
                  ELSE 1e-7 END AS p
      FROM db
      LEFT JOIN big2 ON big2.w1 = db.w1 AND big2.w2 = db.w2
      LEFT JOIN uni ON uni.w2 = db.w2
    )
    SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
           round(-sum(n * log2(p)) / sum(n), 6) AS log_ppl
    FROM scored GROUP BY doc_id
"""


@query("dx35_perplexity", sql=_PPL_SQL)
def dx35_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: train a Stupid Backoff bigram
    LM on a corpus slice (two groupBy-counts — the word-count shape),
    score every document by per-token log2 perplexity. The model is
    joined on its natural key, never broadcast or collected; per-doc
    bigrams pre-aggregate before the join (operators/lm_quality.py)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 3 != 0)
    bigrams, unigrams, total = train_bigram_lm(train)
    out = score_perplexity(docs, bigrams, unigrams, total)
    return out.select(
        "doc_id", "n_tokens", F.round("log_ppl", 6).alias("log_ppl"))


# ---------------------------------------------------- heavy hitters

_HH_K = 20
_HH_CAP = 1000

_HH_SQL = f"""
    WITH words AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents
    )
    SELECT word, count(*) AS cnt FROM words
    GROUP BY word ORDER BY cnt DESC, word LIMIT {_HH_K}
"""


@query("dx36_heavy_hitters", sql=_HH_SQL)
def dx36_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass exact heavy hitters over the corpus token stream:
    per-partition top-capacity summaries (Arrow mapInPandas, no
    shuffle), candidate union broadcast back as a semi-join filter,
    exact recount of candidates only — shuffle is O(capacity x
    partitions), not O(vocabulary) (operators/heavy_hitters.py).
    With capacity >= the vocabulary the guarantee makes the result
    exactly the global top-k, so the oracle is the exact count."""
    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"))
    counted, _thr = heavy_hitters(words, "word", k=_HH_K, capacity=_HH_CAP)
    return counted
