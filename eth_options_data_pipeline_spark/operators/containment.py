"""Near-containment detection: documents subsumed by other documents.

Jaccard near-dup (operators/text.py MinHash, queries/fuzzy.py LSH)
misses the asymmetric case: a short document wholly quoted inside a
much longer one has tiny Jaccard similarity but containment ~1.0.
Training-corpus curation treats subsumed documents as duplicates of
their container (the SlimPajama-style cleanup), so containment is its
own first-class dedup statistic:

    containment(A -> B) = |shingles(A) & shingles(B)| / |shingles(A)|

Scale shape (the classic inverted-index pattern, all equi-joins):

  1. word n-gram shingles per document — a per-row projection;
  2. a document-frequency cap drops shingles appearing in more than
     ``df_cap`` documents (boilerplate/stopword n-grams): bounds every
     shingle bucket, so the self-join emits at most ``df_cap**2`` pair
     rows per shingle regardless of corpus size — same role as the
     giant-bucket cap in the MinHash-LSH miner (queries/fuzzy.py);
  3. shared-shingle counts via the bucket self-join, then one ratio
     filter against the per-document shingle counts.

All counts (numerator AND denominator) are over the capped shingle
space, so the statistic is self-consistent and engine-reproducible.
No counterpart in the reference (row-oriented options pipeline,
main.py:43-351); this extends the brief's dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _expansion_partitions(sh: DataFrame) -> int:
    """Partition count for the bucket table feeding the cap**2 in-row
    pair expansion — scale-adaptive via ``partitions_for_bytes`` when
    the shingle relation is file-backed, else the session parallelism.

    Why an explicit repartition at all (r17, guide §2.2/§2.5): the
    bucket table is tiny in BYTES (one row per shingle, a capped
    doc_id array), so AQE's partition coalescing — which sizes by
    shuffle bytes — merges the post-aggregation partitions down to
    one, and the Generate above it then expands up to cap**2 pair
    structs per bucket on a SINGLE core. AQE cannot see the expansion
    factor of a Generate. Measured at sf0.1 on the streaming-index
    serve path (260k-row index): 4.24 s -> 1.28 s min-of-3 with the
    expansion spread across the session's cores."""
    try:
        sized = bool(sh.inputFiles())
    except Exception:
        sized = False
    if sized:
        from eth_options_data_pipeline_spark.sources import (
            partitions_for_bytes,
        )
        return partitions_for_bytes(sh)
    return sh.sparkSession.sparkContext.defaultParallelism


def shingle_expr(text_col: str = "text", n: int = 3):
    """The word n-gram shingle array as a Column expression — the ONE
    definition of shingling, shared by shingle_table and
    containment_pairs (and mirrored by the dx58 SQL oracle), so the
    engine and oracle can never silently diverge (ADVICE r09)."""
    words = F.filter(F.split(F.trim(F.col(text_col)), " "),
                     lambda w: w != F.lit(""))
    k = F.size(words) - F.lit(n - 1)
    return F.when(
        k >= F.lit(1),
        F.transform(F.sequence(F.lit(0), k - F.lit(1)),
                    lambda i: F.array_join(
                        F.slice(words, i + F.lit(1), n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def shingle_table(docs: DataFrame, text_col: str = "text", n: int = 3,
                  id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_id, shingle) word n-grams. Documents with fewer
    than ``n`` words contribute no shingles (and therefore never
    appear in containment output) — the statistic is undefined for
    them. Pure per-row array expressions until the final distinct."""
    return (docs.where(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(shingle_expr(text_col, n)).alias("shingle"))
            .distinct())


def containment_pairs(docs: DataFrame, text_col: str = "text", n: int = 3,
                      min_containment: float = 0.5,
                      df_cap: int = 20) -> DataFrame:
    """Directional near-containment pairs (doc_id, contained_in,
    shared, m_small, m_big, containment): the smaller document's
    capped shingle set overlaps the larger's by at least
    ``min_containment``. Size ties break on doc_id so each unordered
    pair appears exactly once. ``containment`` is rounded to 6 dp for
    cross-engine hash stability.

    One groupBy(shingle) builds the bucket (collect_set dedups the
    per-doc shingle multiplicity in the same shuffle), the df-cap is a
    plain size predicate on the bucket array, and candidate pairs are
    an IN-ROW expansion of the bounded array (<= cap^2 per bucket) —
    the giant-bucket-cap pattern of the LSH miner (queries/fuzzy.py),
    with no self-join and no per-shingle window sort.  Shingling is
    shingle_expr — exploded WITHOUT shingle_table's distinct (the
    collect_set dedups per-doc multiplicity inside the same shuffle,
    saving the extra exchange)."""
    sh = (docs.where(F.col(text_col).isNotNull())
          .select(F.col("doc_id"),
                  F.explode(shingle_expr(text_col, n)).alias("shingle")))
    return pairs_from_shingles(sh, min_containment=min_containment,
                               df_cap=df_cap)


def pairs_from_shingles(sh: DataFrame, min_containment: float = 0.5,
                        df_cap: int = 20) -> DataFrame:
    """containment_pairs from an already-materialized (doc_id,
    shingle) relation — the serve path of the streaming screen
    (streaming/containment_stream.py), which maintains the shingle
    table incrementally and computes pairs from the persisted index.
    Per-doc shingle multiplicity need not be pre-deduped (collect_set
    dedups inside the bucket shuffle). Same plan from here on as
    containment_pairs."""
    buckets = (sh.groupBy("shingle")
               .agg(F.collect_set("doc_id").alias("ds"))
               .where(F.size("ds") <= df_cap)
               .where(F.size("ds") >= 1))
    # When the shingle relation arrives UNSPREAD (the streaming screen
    # serves from a small 3-file index; a real lake index arrives
    # multi-split and never takes this branch), AQE coalesces the
    # bucket exchange down to one partition — it sizes by shuffle
    # BYTES and cannot see that the Generate above expands each bucket
    # up to cap**2 pair structs — and the whole expansion then runs on
    # a single core. Spread the bucket table with an explicit
    # round-robin repartition (exempt from AQE coalescing; a hash
    # repartition on "shingle" would be optimizer-removed as redundant
    # against the aggregation's own partitioning and then coalesced).
    # Gated on actual upstream parallelism so already-spread inputs —
    # where the expansion was measured NOT starved — don't pay three
    # extra exchanges for nothing (the bucket subtree is triplicated
    # across its m/pairs consumers). Interleaved A/B at sf0.1 (r17):
    # serve-from-index 3.73 s -> 1.92 s min-of-4; spread-input path
    # unchanged (gate off).
    try:
        upstream = sh.rdd.getNumPartitions()
    except Exception:
        upstream = None
    par = sh.sparkSession.sparkContext.defaultParallelism
    if upstream is not None and upstream < par:
        buckets = buckets.repartition(_expansion_partitions(sh))
    # per-doc shingle counts over the SAME capped space
    m = (buckets.select(F.explode("ds").alias("doc_id"))
         .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh")))
    # in-row ordered-pair expansion, bounded by cap^2 per bucket
    pair_arr = F.flatten(F.transform(
        "ds",
        lambda a: F.filter(
            F.transform("ds", lambda b: F.struct(a.alias("sid"),
                                                 b.alias("bid"))),
            lambda p: p["sid"] != p["bid"]),
    ))
    pairs = (buckets.select(F.explode(pair_arr).alias("p"))
             .groupBy("p.sid", "p.bid")
             .agg(F.count(F.lit(1)).alias("shared")))
    ma = m.select(F.col("doc_id").alias("sid"), F.col("n_sh").alias("m_small"))
    mb = m.select(F.col("doc_id").alias("bid"), F.col("n_sh").alias("m_big"))
    out = (pairs.join(ma, "sid").join(mb, "bid")
           .where((F.col("m_small") < F.col("m_big"))
                  | ((F.col("m_small") == F.col("m_big"))
                     & (F.col("sid") < F.col("bid"))))
           .withColumn("containment",
                       F.round(F.col("shared").cast("double")
                               / F.col("m_small"), 6))
           .where(F.col("containment") >= min_containment))
    return out.select(F.col("sid").alias("doc_id"),
                      F.col("bid").alias("contained_in"),
                      F.col("shared").cast("long").alias("shared"),
                      F.col("m_small").cast("long").alias("m_small"),
                      F.col("m_big").cast("long").alias("m_big"),
                      "containment")
