"""BPE vocabulary induction — the pair-statistics kernel.

Byte-Pair Encoding training picks, at each round, the adjacent symbol
pair with the highest corpus frequency. The classic scale trick (used
by every BPE trainer since Sennrich et al. 2016) is that pair counts
live on the WORD-FREQUENCY table, not the corpus: a 100 TB corpus has
a vocabulary of maybe 10^7 distinct words, so each merge round is an
aggregation over millions of (word, freq) rows, not trillions of
tokens. This module implements that kernel Spark-first:

  corpus -> (word, freq)            one groupBy (map-side combined)
         -> explode adjacent pairs  per-row transform over the word
         -> pair counts             second bounded groupBy
         -> top-k merge candidates  TakeOrdered over the pair space

The pair space is bounded by (alphabet + merged symbols)^2 — tiny —
so the final ranking is over a few thousand rows regardless of corpus
size. Iterating merges would re-segment words against the chosen
pair per round (same shape per round); this face exposes round one,
which contains every distributed pattern of the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-split text."""
    w = F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("w")
    return (docs.where(F.col(text_col).isNotNull())
            .select(w).where(F.col("w") != "")
            .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))


def pair_statistics(docs: DataFrame, text_col: str = "text",
                    k: int = 20) -> DataFrame:
    """Top-``k`` adjacent character pairs by corpus frequency:
    (rank, pair, cnt) — the BPE merge-selection statistic. Counts are
    exact integers; ties break on the pair string, so the ranking is
    total and engine-independent."""
    vocab = word_frequencies(docs, text_col).where(F.length("w") >= 2)
    pairs = vocab.select(
        F.explode(F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.substring(F.col("w"), i, F.lit(2)),
        )).alias("pair"),
        "freq",
    )
    agg = pairs.groupBy("pair").agg(F.sum("freq").alias("cnt"))
    top = agg.orderBy(F.col("cnt").desc(), "pair").limit(k)
    # rank over the k survivors only (k rows — not a global window
    # over the pair space)
    w = Window.orderBy(F.col("cnt").desc(), "pair")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "pair", "cnt")
