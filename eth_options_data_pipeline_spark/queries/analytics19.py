"""Round-10 late faces: Bloom-filter contamination pre-screen (dx62)
and per-group closed-form OLS (dx63).

dx62 is the scale-path variant of dx21's exact contamination screen:
when the reference set is too large to broadcast as strings, broadcast
a fixed-size Bloom bitset instead, prune the corpus map-side, and run
the exact confirm join on the surviving slice. The filter has no
false negatives, so the served statistic is EXACTLY the plain
intersection — which is what the DuckDB oracle computes, with no bloom
at all. The filter's entire effect is on the plan; its absence from
the oracle is the invariant worth a driver row.

dx63 fits one tiny trend model per group in a single pass: the five
OLS sufficient statistics are exact int64 sums (values scaled to
fixed-point BEFORE summing), map-side combinable, and the closed-form
slope/intercept/r² runs on the grouped scalars with an expression tree
mirrored verbatim in the oracle.

q46 closes the wide-to-long melt gap in the relational surface: the
inverse of q27's pivot, planned as an in-row Expand (no shuffle for
the row amplification).

No counterpart in the reference (row-oriented options pipeline,
main.py:43-351); extends the corpus-curation (SURVEY §2 extensions)
family.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators import text as tx
from eth_options_data_pipeline_spark.operators.artifacts import (
    session_artifact,
)
from eth_options_data_pipeline_spark.operators.bloom import (
    bloom_build, bloom_layout, bloom_prune, fp_micro_fixed_point,
    fp_micro_oracle_ctes, sized_bits,
)
from eth_options_data_pipeline_spark.operators.regression import group_ols
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table

# ------------------------------------- Bloom contamination pre-screen

_BLOOM_N = 5           # word-gram order
_BLOOM_BENCH_MOD = 11  # bench slice = doc_id % 11 == 0 (disjoint stat
                       # from dx21's % 13 split)
_BLOOM_K = 3           # hash probes per member

_SH5 = tx.shingles_sql("text", n=_BLOOM_N)

_BLOOM_SQL = f"""
    WITH train AS (
      SELECT doc_id, {_SH5} AS sh FROM documents
      WHERE doc_id % {_BLOOM_BENCH_MOD} <> 0
    ),
    bench AS (
      SELECT {_SH5} AS sh FROM documents
      WHERE doc_id % {_BLOOM_BENCH_MOD} = 0
    ),
    bg AS (SELECT DISTINCT unnest(sh) AS gram FROM bench),
    tg AS (SELECT doc_id, unnest(sh) AS gram FROM train),
    hits AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM tg JOIN bg USING (gram) GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_grams FROM train)
    SELECT h.doc_id, t.n_grams, h.n_hits,
           round(h.n_hits / CAST(t.n_grams AS DOUBLE), 6) AS hit_rate
    FROM hits h JOIN totals t USING (doc_id)
"""


def _bloom_hits(spark: SparkSession, sf_dir: str,
                use_bloom: bool = True) -> DataFrame:
    """Shared kernel: contamination hits, optionally bloom-pruned.

    ``use_bloom=False`` is the test-only direct path proving the
    filter changes the plan and nothing else."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    grams = tx.word_shingles(F.col("text"), n=_BLOOM_N)
    train = docs.where(F.col("doc_id") % _BLOOM_BENCH_MOD != 0)
    # localCheckpoint (not cache): the bench gram set feeds the sizing
    # count, the bitset build AND the confirm join, and the bitset
    # broadcasts once per probe seed (Spark does not ReuseExchange
    # across the differently-aliased lookups) — without materializing
    # once, the documents table would be re-scanned for every consumer
    # (observed: 6 scans -> 2). Checkpointed partitions are released by
    # the ContextCleaner when the face's result is done; cache entries
    # would accumulate for the life of the shared 123-face session.
    from eth_options_data_pipeline_spark.operators import scratch
    scratch.rotate(f"bloom_hits.{use_bloom}")
    bench_grams = scratch.cache(
        docs.where(F.col("doc_id") % _BLOOM_BENCH_MOD == 0)
        .select(F.explode(grams).alias("gram"))
        .distinct(),
        f"bloom_hits.{use_bloom}")
    train_grams = train.select(
        "doc_id", F.explode(grams).alias("gram"))
    if use_bloom:
        m_bits = sized_bits(bench_grams.count())
        bloom = scratch.cache(
            bloom_build(bench_grams, "gram", m_bits, k=_BLOOM_K),
            f"bloom_hits.{use_bloom}")
        train_grams = bloom_prune(
            train_grams, "gram", bloom, m_bits, k=_BLOOM_K)
    hits = (train_grams.join(F.broadcast(bench_grams), "gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hits")))
    totals = train.select(
        "doc_id", F.size(grams).cast("long").alias("n_grams"))
    return (hits.join(totals, "doc_id")
            .select("doc_id", "n_grams", "n_hits",
                    F.round(F.col("n_hits") / F.col("n_grams"), 6)
                    .alias("hit_rate")))


# dx62_bloom_prefilter retired r12 (VERDICT r11 item 6): the
# single-bitset broadcast-prune regime is now covered at operator
# level — answer equality by tests/test_bloom.py::
# test_dx62_bloom_path_equals_direct_path (bloom vs direct over the
# same corpus), the all-broadcast plan shape by tests/test_plans.py::
# test_bloom_prefilter_probe_side_never_shuffles (compiles _bloom_hits
# directly) — while the driver-checked bloom face is dx65's sharded
# large-reference regime, which exercises the same build/probe/confirm
# kernels at >1M members. _bloom_hits stays as the tested kernel.


# ---------------------------------- sharded Bloom at >1M members (dx65)
#
# dx62 proves the bloom invariant in the single-bitset regime; this is
# the LARGE-reference regime the operator's pitch names: a membership
# set past the 2^24-bit single-shard cap, laid out by bloom_layout into
# power-of-two shards (each its own <=2 MiB bitset, keyed by a
# row-local hash of the value), and a confirm join run WITHOUT a
# broadcast — the shuffle carries only bloom survivors, which is the
# honest 100 TB plan when the member strings no longer broadcast.
#
# The member set models what a real blocklist is: FIXED-SIZE relative
# to the corpus — a benchmark union or URL denylist does not grow when
# the crawl does. It is synthesized deterministically from a pinned
# 500-document reference slice (doc_id < _DX65_REF_DOCS, present at
# every sf) x _DX65_PER_DOC suffixes = 1.1M members at EVERY scale, so
# the sharded layout (2 shards x 2^24 bits) is exercised by every
# local run AND the sf0.01 driver check, while the PROBE side (orders
# keys x _DX65_PROBE_AMP) scales with the corpus — the actual 100 TB
# axis. ~Half the probes are in-set (o_orderkey % 1000 < 500). The
# layout is emitted as guarantee columns (qx28/qx48 convention) whose
# closed form the oracle reproduces with exact integer math
# (length(bin(16n-1)) == ceil(log2(16n))).

_DX65_REF_DOCS = 500   # pinned reference slice: doc_id < 500
_DX65_PER_DOC = 2200   # member suffixes per reference doc (-> 1.1M)
_DX65_PROBE_AMP = 36   # probe suffixes per order
_DX65_K = 3

_DX65_SQL = f"""
    WITH RECURSIVE m AS (
      SELECT b.doc_id::VARCHAR || '-' || s::VARCHAR AS member
      FROM (SELECT doc_id FROM documents WHERE doc_id < {_DX65_REF_DOCS}) b
      CROSS JOIN (SELECT unnest(range({_DX65_PER_DOC})) AS s)
    ),
    p AS (
      SELECT o_orderpriority,
             (o_orderkey % 1000)::VARCHAR || '-' || s::VARCHAR AS member
      FROM orders CROSS JOIN (SELECT unnest(range({_DX65_PROBE_AMP})) AS s)
    ),
    layout AS (
      SELECT n_members, e,
             CAST(1 AS BIGINT) << least(e, 24) AS m_bits_shard,
             CAST(1 AS BIGINT) << least(greatest(e - 24, 0), 10) AS n_shards
      FROM (
        SELECT CAST(count(*) AS BIGINT) AS n_members,
               greatest(length(bin(16 * count(*) - 1)), 12) AS e
        FROM m
      )
    ),
    {fp_micro_oracle_ctes(_DX65_K).strip()},
    g AS (
      SELECT n_members, n_shards, m_bits_shard,
             (n_shards * m_bits_shard * 1000) // n_members AS bpe_milli,
             CAST((ed_fp * ed_fp * ed_fp)
                  // CAST('1000000000000000000000000000000' AS HUGEINT)
                  AS BIGINT) AS fp_micro
      FROM layout CROSS JOIN edfp
    )
    SELECT h.o_orderpriority AS priority, h.n_hits,
           g.n_members, g.n_shards, g.m_bits_shard, g.bpe_milli,
           g.fp_micro
    FROM (
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_hits
      FROM p JOIN m USING (member) GROUP BY o_orderpriority
    ) h CROSS JOIN g
"""


@query("dx65_sharded_bloom", sql=_DX65_SQL)
def dx65_sharded_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-Bloom membership screen past the single-bitset cap:
    a FIXED 1.1M-member reference set (a blocklist doesn't grow with
    the corpus) lays out as 2 shards x 2^24 bits at every sf
    (operators/bloom.py bloom_layout — achieved bits/element and
    implied FP rate ride along as guarantee columns), the corpus-
    scaled probe stream prunes through k=3 broadcast (shard, word)
    bit tests, and the exact confirm join runs as a SHUFFLE join of
    the survivors — the large-reference plan where the member strings
    must never broadcast. Served counts are exactly the plain
    intersection's (no false negatives), which is what the bloomless
    oracle computes."""
    # the pinned reference slice: 500 doc keys, amplified in-line to
    # 1.1M member strings by every consumer — a pure map-side
    # projection over a tiny base, so nothing big is ever stored,
    # deduplicated, or checkpointed (members are distinct by
    # construction: unique doc_id x unique suffix)
    from eth_options_data_pipeline_spark.operators import scratch
    base = scratch.scoped_cache(
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _DX65_REF_DOCS)
        .select("doc_id"),
        "dx65")
    amp = F.explode(
        F.sequence(F.lit(0), F.lit(_DX65_PER_DOC - 1))).alias("s")
    members = (base.select("doc_id", amp)
               .select(F.concat_ws("-", "doc_id", "s").alias("member")))
    # |members| = |base| * PER_DOC exactly, so sizing needs one count
    # of the 500-row side only
    n = base.count() * _DX65_PER_DOC
    n_shards, m_bits = bloom_layout(n)
    # the bitset is a CONSTANT of the pinned reference set — freeze it
    # once per session (operators/artifacts.py): a real blocklist
    # filter is built once and served many times, so later invocations
    # (bench reruns, suite siblings) pay a ~512k-row parquet scan, not
    # a 1.1M-member aggregate (VERDICT r11 wrong #2)
    bloom_frozen = session_artifact(
        spark, "dx65_bloom", sf_dir, "bitset",
        lambda: bloom_build(members, "member", m_bits,
                            k=_DX65_K, n_shards=n_shards))
    probe = (load_table(spark, sf_dir, "orders")
             .select("o_orderpriority", "o_orderkey",
                     F.explode(F.sequence(
                         F.lit(0), F.lit(_DX65_PROBE_AMP - 1))).alias("s"))
             .select("o_orderpriority",
                     F.concat_ws("-", F.col("o_orderkey") % 1000, "s")
                     .alias("member")))
    survivors = bloom_prune(probe, "member", bloom_frozen, m_bits,
                            k=_DX65_K, n_shards=n_shards)
    # shuffle_hash hint ON THE MEMBERS SIDE: at test scale the planner
    # would happily broadcast SOMETHING; the hint pins the
    # large-reference plan the face exists to prove — the confirm
    # shuffle carries only bloom survivors, never a broadcast. The
    # hinted side is the BUILD side (per-task hash map), and it must
    # be the FIXED member set (1.1M strings -> ~34k per task at 32
    # partitions, bounded at ANY corpus scale), never the
    # corpus-scaled survivor stream: the r14 sf5 ramp run built
    # survivors (13.5M strings) and died in SparkOutOfMemoryError
    # exactly as a 100 TB run would.
    hits = survivors.join(members.hint("shuffle_hash"), "member")
    total_bits = n_shards * m_bits
    # implied FP rate by the PINNED fixed-point algorithm (not libm):
    # both engines evaluate the identical integer recurrence, so the
    # floor can never flip on a 1-ulp exp() difference (ADVICE r11)
    fp_micro = fp_micro_fixed_point(_DX65_K, n, total_bits)
    return (hits.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(
                F.col("o_orderpriority").alias("priority"),
                F.col("n_hits").cast("long").alias("n_hits"),
                F.lit(n).cast("long").alias("n_members"),
                F.lit(n_shards).cast("long").alias("n_shards"),
                F.lit(m_bits).cast("long").alias("m_bits_shard"),
                F.lit(total_bits * 1000 // n).cast("long").alias("bpe_milli"),
                F.lit(fp_micro).cast("long").alias("fp_micro")))


# ------------------------------------------- per-group closed-form OLS

_OLS_SQL = """
    WITH pts AS (
      SELECT event_type,
             CAST(hour(ts) AS BIGINT) AS x,
             CAST(round(value * 1000) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n, sx, sy, sxy, sxx, syy,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 / CAST(1000 AS DOUBLE), 6) AS slope,
           round((CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 / CAST(1000 AS DOUBLE), 6) AS intercept,
           round(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS r2
    FROM s
"""


@query("dx63_pergroup_ols", sql=_OLS_SQL)
def dx63_pergroup_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value-vs-hour-of-day trend: closed-form OLS from
    exact int64 sufficient statistics (value scaled to millis before
    summing, operators/regression.py) — one map-side-combinable pass,
    one exchange of five numbers per group. slope/intercept are in
    value-units per hour (the /1000 de-scales y); the sums are emitted
    so the hash also pins the exact integer layer."""
    events = load_table(spark, sf_dir, "events")
    pts = events.select(
        "event_type",
        F.hour("ts").alias("x"),
        F.round(F.col("value") * 1000).cast("long").alias("y"))
    fit = group_ols(pts, ["event_type"], "x", "y")
    thousand = F.lit(1000).cast("double")
    return fit.select(
        "event_type", "n", "sx", "sy", "sxy", "sxx", "syy",
        F.round(F.col("slope") / thousand, 6).alias("slope"),
        F.round(F.col("intercept") / thousand, 6).alias("intercept"),
        F.round("r2", 6).alias("r2"),
    )


# ------------------------------------------------- unpivot/melt surface

_UNPIVOT_SQL = """
    SELECT l_returnflag, metric,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(val * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_micro
    FROM (
      UNPIVOT (SELECT l_returnflag, l_quantity, l_extendedprice,
                      l_discount, l_tax FROM lineitem)
      ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME metric VALUE val
    )
    GROUP BY l_returnflag, metric
"""

_UNPIVOT_METRICS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query("q46_unpivot_long", sql=_UNPIVOT_SQL)
def q46_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long melt (the inverse of q27's pivot): four lineitem
    measures unpivot to (flag, metric, val) rows and aggregate per
    (flag, metric). Catalyst plans unpivot as an in-row Expand — the
    4x amplification never shuffles; the partial aggregate combines
    map-side and the single exchange carries 12 grouped rows. Sums are
    exact integer micro-units (per-row round THEN sum)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", *_UNPIVOT_METRICS)
    long = li.unpivot(["l_returnflag"], _UNPIVOT_METRICS, "metric", "val")
    return (long.groupBy("l_returnflag", "metric")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("val") * 1000000).cast("long"))
                 .alias("sum_micro")))
