"""Round-8/9 corpus faces: the BPE tokenizer, both sides.

* dx56 — APPLY: tokenize + token-count under a frozen merge table
  (operators/bpe.py token_stream), the inference side every
  mixture/budget/packing decision consumes.
* dx57 — TRAIN: the iterated merge loop (count pairs -> pick top
  pair -> re-segment, N rounds) that welds dx55's round-one pair
  statistics and dx56's frozen-table apply into a driver-checked
  trainer (operators/bpe.py train_merges).

No counterpart in the reference (its pipeline is row-oriented options
data, main.py:43-351); this is LLM-training-corpus tooling at the
layer the brief's "token counting (whitespace + a BPE-ish regex)"
names.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.bpe import (
    FROZEN_MERGES,
    pair_counts,
    token_stream_sql,
    tokenize_stats,
    train_merges,
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


# ----------------------------------------- BPE merge-loop training (dx57)
#
# The one distributed pattern dx55/dx56 left uncovered (VERDICT r08
# item 4): N rounds of select-top-pair -> re-segment -> re-count on
# the |vocab|-bounded segmented word table. The chosen pair flows
# through a broadcast 1-row scalar join into a data-dependent
# replace, so nothing touches the driver; the oracle replays the
# identical loop as a CTE chain (seg_k -> pairs -> top-1 -> seg_{k+1})
# with the same total order (cnt DESC, a, b) at every selection.

_TRAIN_ROUNDS = 3
_TRAIN_FINAL_K = 10

# stream0 must match operators/bpe.py token_stream([]): dotall
# char-symbolization of the word, spaces (absent in split words)
# as the boundary symbol.
_SEG0_SQL = "regexp_replace(replace(w, ' ', '▁'), '(?s)(.)', ' \\1·', 'g')"


def _pairs_cte(name: str, seg: str) -> str:
    """Adjacent-symbol-pair counts over a segmented vocabulary CTE —
    the SQL twin of operators/bpe.py pair_counts on the ``" sym·"``
    wire format (parts are 1-indexed; the trailing split element is
    empty, so pair i spans parts[i+1], parts[i+2])."""
    return f"""{name} AS (
      SELECT ltrim(parts[i + 1]) AS a, ltrim(parts[i + 2]) AS b,
             CAST(sum(freq) AS BIGINT) AS cnt
      FROM (SELECT string_split(stream, '·') AS parts, freq,
                   unnest(range(len(string_split(stream, '·')) - 2)) AS i
            FROM {seg})
      GROUP BY 1, 2
    )"""


def _train_sql(rounds: int = _TRAIN_ROUNDS, final_k: int = _TRAIN_FINAL_K) -> str:
    ctes = [
        """words AS (
      SELECT unnest(string_split(trim(text), ' ')) AS w
      FROM documents WHERE text IS NOT NULL
    )""",
        """vocab AS MATERIALIZED (
      SELECT w, count(*) AS freq FROM words WHERE w <> '' GROUP BY w
    )""",
        f"seg0 AS MATERIALIZED (SELECT {_SEG0_SQL} AS stream, freq FROM vocab)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(_pairs_cte(f"p{r - 1}", f"seg{r - 1}"))
        ctes.append(
            f"t{r} AS MATERIALIZED (SELECT a, b, cnt FROM p{r - 1} "
            f"ORDER BY cnt DESC, a, b LIMIT 1)")
        ctes.append(
            f"""seg{r} AS MATERIALIZED (
      SELECT replace(stream, ' ' || a || '· ' || b || '·',
                     ' ' || a || b || '·') AS stream, freq
      FROM seg{r - 1}, t{r}
    )""")
    ctes.append(_pairs_cte(f"p{rounds}", f"seg{rounds}"))
    ctes.append(
        f"""fin AS (
      SELECT 'final' AS part,
             CAST(row_number() OVER (ORDER BY cnt DESC, a, b) AS INT) AS rank,
             a, b, cnt
      FROM p{rounds}
    )""")
    merges = "\n    UNION ALL ".join(
        f"SELECT 'merge' AS part, CAST({r} AS INT) AS rank, a, b, cnt FROM t{r}"
        for r in range(1, rounds + 1))
    return ("WITH " + ",\n    ".join(ctes) + "\n    " + merges
            + f"\n    UNION ALL SELECT * FROM fin WHERE rank <= {final_k}")


@query("dx57_bpe_train", sql=_train_sql())
def dx57_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterated BPE training: 3 merge rounds learned end-to-end on the
    engine (operators/bpe.py train_merges — pair counts on the
    segmented word-frequency table, top-pair selection under a total
    order, broadcast-scalar re-segmentation), then the learned merge
    table plus the post-training top-10 pair statistics. Repeated
    subplans across rounds collapse via exchange reuse, so the corpus
    is scanned once per job regardless of round count."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    tops, seg = train_merges(docs, "text", rounds=_TRAIN_ROUNDS)
    base = spark.range(1)
    merge_rows = [
        base.select(F.lit("merge").alias("part"),
                    F.lit(r).cast("int").alias("rank"),
                    F.lit(t["a"]).alias("a"), F.lit(t["b"]).alias("b"),
                    F.lit(t["cnt"]).cast("long").alias("cnt"))
        for r, t in enumerate(tops, 1)
    ]
    w = Window.orderBy(F.col("cnt").desc(), "a", "b")
    fin = (pair_counts(seg)
           .orderBy(F.col("cnt").desc(), "a", "b").limit(_TRAIN_FINAL_K)
           .select(F.lit("final").alias("part"),
                   F.row_number().over(w).cast("int").alias("rank"),
                   "a", "b", "cnt"))
    return reduce(DataFrame.unionByName, merge_rows + [fin])
