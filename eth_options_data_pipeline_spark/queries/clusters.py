"""Duplicate-cluster assignment: connected components over the
near-dup pair graph — the step that turns pairwise LSH hits into
dedup groups with one canonical survivor per cluster.

Spark side: alternating large-star/small-star contraction
(``operators.components.connected_components`` — Kiveris et al.,
SoCC'14): O(log n) rounds on ANY graph shape, two edge-list shuffles
per round, lineage truncated per round via localCheckpoint. Round 1
used min-label propagation here (rounds = cluster diameter — fine for
dense dedup graphs, pathological on chains); the star algorithm is
strictly the better 100 TB shape and this query is its oracle face.

Oracle side: DuckDB recursive CTE computing the transitive closure and
taking the minimum reachable id — an independent algorithm arriving at
the same labeling, which makes this rare thing: an oracle-checked
iterative graph computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators import text as tx
from eth_options_data_pipeline_spark.operators.components import connected_components
from eth_options_data_pipeline_spark.queries.fuzzy import _MH_COLS_SQL, _SH
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table

_JACCARD_MIN = 0.5

_BAND_SQL = ", ".join(
    f"'{b}|' || mh{2 * b} || '|' || mh{2 * b + 1}" for b in range(tx.LSH_BANDS)
)


@query(
    "dx13_dup_clusters",
    sql=f"""
    WITH RECURSIVE sh AS MATERIALIZED (SELECT doc_id, {_SH} AS sh FROM documents),
    sig AS MATERIALIZED (
      SELECT doc_id, sh,
             {_MH_COLS_SQL}
      FROM sh
    ), bands AS MATERIALIZED (
      SELECT doc_id, unnest([{_BAND_SQL}]) AS band_key FROM sig
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT c.doc_a, c.doc_b FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b
      WHERE len(list_intersect(sa.sh, sb.sh))
              / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            >= {_JACCARD_MIN}
    ), bi AS MATERIALIZED (
      -- MATERIALIZED: the recursive CTE below re-evaluates its inputs
      -- every iteration; without the hint each round re-runs the whole
      -- minhash+jaccard pipeline (measured 15s -> 5s at sf0.001)
      SELECT doc_a AS s, doc_b AS d FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ), reach(s, d) AS (
      SELECT s, d FROM bi
      UNION
      SELECT r.s, b.d FROM reach r JOIN bi b ON r.d = b.s
    ), comp AS (
      SELECT s AS doc_id, least(s, min(d)) AS component FROM reach GROUP BY s
    )
    SELECT c.doc_id, c.component, cs.n AS cluster_size
    FROM comp c JOIN (SELECT component, count(*) AS n FROM comp GROUP BY component) cs
      USING (component)
    """,
)
def dx13_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash-LSH candidates -> Jaccard >= 0.5
    edges -> connected components (component id = min doc_id in the
    cluster) -> (doc_id, component, cluster_size) for every clustered
    document."""
    from eth_options_data_pipeline_spark.operators import scratch

    docs = load_table(spark, sf_dir, "documents")
    # cache consumed ONLY during the eager edge build below — released
    # before this face returns (r16, guide §5: it used to stay pinned
    # for the session and serve later bench reps' identical plans)
    sh = docs.select("doc_id", tx.word_shingles(F.col("text")).alias("sh")).cache()
    mh = tx.minhash_signature(F.col("sh"))
    sig = sh.select("doc_id", "sh", *[c.alias(f"mh{j}") for j, c in enumerate(mh)])
    bands = sig.select(
        "doc_id",
        F.explode(tx.band_keys([F.col(f"mh{j}") for j in range(tx.MINHASH_K)])).alias("band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sha = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    shb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    # the shared corpus x corpus verify join (tx.verify_join): bounded
    # SHJ build via the partitions-scale-with-bytes rule, plan pinned
    # at operator level (r15, VERDICT r14 item 3); swap broadcast for
    # shuffle_hash beyond ~10M candidates
    edges = (
        tx.verify_join(cand, sha, shb, docs)
        .where(tx.jaccard(F.col("sh_a"), F.col("sh_b")) >= _JACCARD_MIN)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    labels = connected_components(
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    ).select(F.col("node").alias("doc_id"), "component")
    # the component loop ran eagerly just above, so the shingle cache
    # and the edge checkpoint are fully consumed — the returned plan
    # reads only the loop's final checkpoint. Release both NOW instead
    # of leaking them for the session (r16, guide §5).
    sh.unpersist(blocking=False)
    scratch.release_ckpt(edges)

    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "component").select("doc_id", "component", "cluster_size")
