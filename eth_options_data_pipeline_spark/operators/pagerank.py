"""PageRank over a link graph — the importance prior web-corpus
curation pipelines use to pick which pages to keep (Common Crawl
publishes harmonic/PageRank-style host ranks exactly for this; the
OpenWebText recipe filters by link popularity). Complements the
content-quality scores (repetition, quality heuristics) with a
graph-structural one.

Spark-first shape: ranks and out-degrees are (node, value) tables;
one iteration = join ranks to the edge list on src (shuffle on node
id), emit contributions dst <- rank/out_deg, groupBy dst (second
shuffle, map-side combinable), apply damping. Dangling nodes (no
out-links) redistribute their mass uniformly — computed as one tiny
aggregate per round, folded into the damping constant, which keeps
the total mass at exactly 1 so ranks stay comparable across graphs.

Iterative hygiene, as in components.py: localCheckpoint per round
truncates the growing lineage; the edge list and degree table are
computed once and cached. Fixed iteration count (no convergence job)
— PageRank's use here is a ranking prior, and the ordering stabilizes
long before the values do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 10, damping: float = 0.85,
             broadcast_nodes_max: int = 2_000_000) -> DataFrame:
    """(node, rank) for every node in the (src, dst) edge list.

    Ranks sum to 1.0 (dangling mass redistributed uniformly).

    Join strategy is picked from the EXACT node count (already needed
    for the 1/n prior): when the rank table fits comfortably in one
    executor (<= broadcast_nodes_max nodes), every iteration
    broadcast-joins ranks into the cached edge scan — the edge list,
    which dominates storage by orders of magnitude on real graphs,
    is NEVER re-shuffled, and the only exchange per round is the
    map-side-combined contribution aggregate (bounded by node count).
    Past the threshold (billion-node web graphs, where ranks can't
    broadcast) it falls back to hash-partitioned joins on the node id
    — the same runtime-statistics-driven choice AQE makes for one
    join, applied across the whole iteration.
    """
    # the edge list is consumed once per round plus twice for setup —
    # cache it (MEMORY_AND_DISK, released on return) so a derived edge
    # list (e.g. a distinct over a fact table) is computed once, not
    # iters+2 times. If the CALLER already persisted it, leave their
    # cache alone (cache() returns the same DataFrame, so an
    # unconditional unpersist here would evict the caller's blocks).
    owns_edges_cache = not edges.is_cached
    if owns_edges_cache:
        edges = edges.cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct().cache()
    )
    n = nodes.count()
    if n == 0:
        if owns_edges_cache:
            edges.unpersist(blocking=False)
        nodes.unpersist(blocking=False)
        return nodes.withColumn("rank", F.lit(0.0))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # degree-weighted edges and the dangling-node set are loop
    # invariants: join them ONCE instead of re-joining ranks to deg
    # every round
    ew = edges.join(deg, "src").cache()
    dang_nodes = nodes.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti").cache()

    small = n <= broadcast_nodes_max
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    live_caches: list[DataFrame] = []
    for i in range(iters):
        # each round's ranks feed TWO consumers (the dangling aggregate
        # and the contribution join); cache so the lineage evaluates
        # once per round instead of forking exponentially
        ranks = ranks.cache()
        live_caches.append(ranks)
        r_b = F.broadcast(ranks) if small else ranks
        # mass sitting on dangling nodes this round — kept as a 1-row
        # lazy aggregate riding the plan via broadcast cross join, so
        # an iteration costs ZERO driver actions (a .first() here
        # would force the whole lineage once per round)
        dangling = (
            ranks.join(F.broadcast(dang_nodes) if small else dang_nodes,
                       "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        contribs = (
            ew.join(r_b, r_b["node"] == ew["src"])
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("w"))
            .groupBy("dst").agg(F.sum("w").alias("in_mass"))
        )
        # same float op order as the scalar form:
        # (1-d)/n + (d * dang) / n + d * in_mass
        base = (F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.col("_dang") / F.lit(float(n)))
        ranks = (
            nodes.join(F.broadcast(contribs) if small else contribs,
                       nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (base
                 + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0)))
                .alias("rank"))
        )
        # truncate lineage periodically (plan depth grows per round and
        # optimizer time goes superlinear past a handful of self-joins)
        # and ALWAYS on the last round, so every per-round cache can be
        # released the moment a checkpoint materializes past it — a
        # long corpus run must not leave iters+2 DataFrames pinned in
        # the block manager per pagerank() call
        # cadence 3 measured ~17% faster than 4 at sf0.1 (shorter
        # nested-broadcast chains per job outweigh the extra
        # materialization); cadence has no effect on the float math,
        # only on where lineage is cut
        if (i + 1) % 3 == 0 or (i + 1) == iters:
            ranks = ranks.localCheckpoint(eager=True)
            for df in live_caches:
                df.unpersist(blocking=False)
            live_caches.clear()
    for df in (nodes, ew, dang_nodes):
        df.unpersist(blocking=False)
    if owns_edges_cache:
        edges.unpersist(blocking=False)
    return ranks
