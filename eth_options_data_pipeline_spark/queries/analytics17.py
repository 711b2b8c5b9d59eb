"""Round-8 corpus faces: the BPE APPLY side — tokenize + token-count
under a frozen merge table (operators/bpe.py). dx55 covers the
training side (pair statistics); this face covers the inference side
every mixture/budget/packing decision consumes. No counterpart in the
reference (its pipeline is row-oriented options data, main.py:43-351);
this is LLM-training-corpus tooling at the layer the brief's
"token counting (whitespace + a BPE-ish regex)" names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from eth_options_data_pipeline_spark.operators.bpe import (
    FROZEN_MERGES,
    token_stream_sql,
    tokenize_stats,
)
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table

_PREFIX_LEN = 64


def _bpe_sql() -> str:
    stream = token_stream_sql("text", FROZEN_MERGES)
    n_tok = "length(stream) - length(replace(stream, ' ', ''))"
    return f"""
    WITH s AS (
      SELECT doc_id, length(text) AS n_chars, {stream} AS stream
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST({n_tok} AS BIGINT) AS n_tokens,
           substr(replace(stream, '·', ''), 2, {_PREFIX_LEN}) AS token_prefix,
           CASE WHEN {n_tok} > 0
                THEN round(CAST(n_chars AS DOUBLE) / ({n_tok}), 6)
                ELSE 0.0 END AS chars_per_token
    FROM s
    """


@query("dx56_bpe_tokenize", sql=_bpe_sql())
def dx56_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-merge BPE tokenization as pure JVM string expressions
    (operators/bpe.py token_stream): zero shuffle, zero Python, one
    projection — a 100 TB token count is a map-only pass. The oracle
    replays the identical replace-chain via token_stream_sql, so both
    engines compute the same greedy left-to-right merge semantics;
    token_prefix pins the actual segmentation, not just the count."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return tokenize_stats(docs, "text", FROZEN_MERGES, prefix_len=_PREFIX_LEN)
