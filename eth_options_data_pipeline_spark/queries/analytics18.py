"""Round-10 faces: streaming near-containment screening (sx09),
MinHash estimator calibration (dx60), ORC format roundtrip (qx52),
salted skew join (dx61), streaming histogram quantiles (sx10).

The dx58 batch kernels run THROUGH a document stream: the corpus
arrives as micro-batches (with deliberate cross-batch re-deliveries),
each batch incrementally maintains the df-capped shingle inverted
index (streaming/containment_stream.py — idempotent batch_id-
partitioned landings, first-arrival dedup), and the served screen
must hash-match the one-shot batch containment statistic. The oracle
is dx58's SQL verbatim: streaming maintenance is invisible in the
result, which is exactly the invariant worth a driver row.

No counterpart in the reference (row-oriented options pipeline,
main.py:43-351); extends the streaming family (SURVEY §2.10).
"""

from __future__ import annotations

import os
import tempfile
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.artifacts import (
    session_artifact,
)
from eth_options_data_pipeline_spark.queries.analytics16 import _stage_slices
from eth_options_data_pipeline_spark.queries.analytics17 import (
    _CONT_DF_CAP, _CONT_MIN, _CONT_N, _CONT_SQL,
)
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table

_SX09_BATCHES = 3
# every doc arrives once at slice doc_id % 3; these ALSO re-arrive in
# the last slice — the screen must not double-index them
_SX09_REDELIVER_MOD = 7


@query("sx09_containment_stream", sql=_CONT_SQL)
def sx09_containment_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming containment screen, served: three document
    micro-batches (slice = doc_id % 3, with the doc_id % 7 == 0 docs
    RE-DELIVERED in the last slice) maintain the shingle index through
    foreachBatch landings (availableNow + checkpoint); the served
    pairs must equal the batch dx58 statistic over the distinct
    corpus. Eager at construction (qx46/sx07/sx08 pattern),
    per-session scratch, stream runs once."""
    from eth_options_data_pipeline_spark.streaming.containment_stream import (
        StreamingContainmentScreen,
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"contstream_face_{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)))
    arrivals = os.path.join(scratch, "in")
    state = os.path.join(scratch, "index")
    ckpt = os.path.join(scratch, "ckpt")
    done = os.path.join(scratch, "_done")
    screen = StreamingContainmentScreen(
        state, n=_CONT_N, min_containment=_CONT_MIN, df_cap=_CONT_DF_CAP)
    if not os.path.isdir(arrivals):
        def _write(staging: str) -> None:
            for i in range(_SX09_BATCHES):
                batch = docs.where(F.col("doc_id") % _SX09_BATCHES == i)
                if i == _SX09_BATCHES - 1:
                    batch = batch.unionByName(
                        docs.where(F.col("doc_id") % _SX09_REDELIVER_MOD == 0))
                batch.coalesce(1).write.mode("append").parquet(staging)
        _stage_slices(_write, arrivals)
    if not os.path.isdir(done):
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(arrivals))
        q = screen.start(stream, ckpt)
        if not q.awaitTermination(300):
            raise TimeoutError("sx09 containment stream did not finish")
        os.makedirs(done, exist_ok=True)
    return screen.screen(spark)


# --------------------------- MinHash estimator calibration (dx60)
#
# The sketch-quality question every fuzzy-dedup deployment must
# answer: how well does the k=8 MinHash component-match fraction
# estimate true Jaccard on THIS corpus? Per LSH candidate pair,
# estimate = (#matching signature components)/k vs the exact shingle
# Jaccard; the face aggregates the calibration curve. All float means
# are computed from exact integer micro-sums (per-pair values rounded
# to 6 dp then scaled to int64 BEFORE summing), so the aggregation is
# order-independent and bit-identical across engines.

def _dx60_sql() -> str:
    from eth_options_data_pipeline_spark.operators import text as tx
    sh = tx.shingles_sql("text")
    mh_cols = ",\n             ".join(
        f"{tx.minhash_sql('sh', j)} AS mh{j}" for j in range(tx.MINHASH_K))
    band = ", ".join(
        f"'{b}|' || mh{2 * b} || '|' || mh{2 * b + 1}"
        for b in range(tx.LSH_BANDS))
    matches = " + ".join(
        f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END"
        for j in range(tx.MINHASH_K))
    k = tx.MINHASH_K
    return f"""
    WITH sh AS (SELECT doc_id, {sh} AS sh FROM documents),
    sig AS (SELECT doc_id, sh, {mh_cols} FROM sh),
    bands AS (SELECT doc_id, unnest([{band}]) AS band_key FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT CAST({matches} AS BIGINT) AS sig_matches,
             CAST(round(
               len(list_intersect(sa.sh, sb.sh))
               / CAST(len(sa.sh) + len(sb.sh)
                      - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               * 1000000) AS BIGINT) AS exact_micro
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b
    )
    SELECT sig_matches,
           round(sig_matches / CAST({k} AS DOUBLE), 6) AS est_sim,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(exact_micro) / 1000000.0 / count(*), 6) AS mean_exact,
           round(sum(abs(sig_matches * 1000000 / {k} - exact_micro))
                 / 1000000.0 / count(*), 6) AS mean_abs_err
    FROM pairs GROUP BY sig_matches
    """


@query("dx60_minhash_error", sql=_dx60_sql())
def dx60_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration curve over the LSH candidate pairs: per
    signature-match count (0..k), how many pairs, their mean exact
    Jaccard, and the mean absolute estimator error. Scale shape is
    dx07's (signatures are per-row projections; the candidate join
    shuffles on band digests only; exact Jaccard runs on candidates
    only); the calibration aggregate is k+1 groups. Means are exact
    integer micro-sums divided once — no float accumulation order."""
    from eth_options_data_pipeline_spark.operators import text as tx

    k = tx.MINHASH_K
    docs = load_table(spark, sf_dir, "documents")
    # rotation-managed cache: the shingle table is consumed by three
    # downstream branches; scratch.rotate releases the previous
    # invocation's blocks at entry, so the old never-released-cache
    # concern (which had forced a localCheckpoint here) is gone — and
    # an unpersisted cache recomputes instead of poisoning stale
    # consumers (r16).
    from eth_options_data_pipeline_spark.operators import scratch
    sh = docs.select(
        "doc_id", tx.word_shingles(F.col("text")).alias("sh"))
    sh = scratch.scoped_cache(sh, "dx60")
    mh = tx.minhash_signature(F.col("sh"))
    sig = sh.select("doc_id", "sh",
                    *[c.alias(f"mh{j}") for j, c in enumerate(mh)])
    bands = sig.select(
        "doc_id",
        F.explode(tx.band_keys(
            [F.col(f"mh{j}") for j in range(k)])).alias("band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    siga = sig.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
                      *[F.col(f"mh{j}").alias(f"a{j}") for j in range(k)])
    sigb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
                      *[F.col(f"mh{j}").alias(f"b{j}") for j in range(k)])
    matches = reduce(
        lambda x, y: x + y,
        [F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
         for j in range(k)])
    pairs = (cand.join(siga, "doc_a").join(sigb, "doc_b")
             .select(matches.cast("long").alias("sig_matches"),
                     F.round(tx.jaccard(F.col("sh_a"), F.col("sh_b"))
                             * 1000000).cast("long").alias("exact_micro")))
    est_micro = (F.col("sig_matches") * 1000000 / F.lit(k)).cast("long")
    return (pairs.groupBy("sig_matches")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum("exact_micro").alias("_sx"),
                 F.sum(F.abs(est_micro - F.col("exact_micro"))).alias("_se"))
            .select(
                "sig_matches",
                F.round(F.col("sig_matches") / F.lit(float(k)), 6).alias("est_sim"),
                F.col("n_pairs").cast("long").alias("n_pairs"),
                F.round(F.col("_sx") / 1000000.0 / F.col("n_pairs"), 6)
                 .alias("mean_exact"),
                F.round(F.col("_se") / 1000000.0 / F.col("n_pairs"), 6)
                 .alias("mean_abs_err")))


# ------------------------------------ ORC source/sink leg (qx52)
#
# qx51 proved JSONL/CSV byte-lossless through the escaping paths;
# this face adds the columnar long-tail format: documents written as
# lang-partitioned ORC, read back with partition pruning (only the
# 'en' partition is listed), digested per row. The oracle digests the
# ORIGINAL parquet rows under the same filter, so a hash match proves
# the ORC write/read leg (including the partition-column value
# roundtrip — lang leaves the file and comes back from the directory
# name) is lossless.

_QX52_SQL = """
    SELECT doc_id, source, lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           md5(text) AS text_md5
    FROM documents WHERE lang = 'en'
"""


@query("qx52_orc_roundtrip", sql=_QX52_SQL)
def qx52_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S2 format matrix, ORC leg: partitioned ORC sink + partition-
    pruned read-back (the filter prunes to the lang=en directory
    before any ORC file is opened). Eager at construction, per-session
    scratch written ONCE through the _stage_slices staging+rename, so
    a crash mid-write leaves only a staging tree the next invocation
    discards — never a partial target an isdir guard would mistake
    for complete (ADVICE r10), and re-runs in the same session serve
    the already-complete tree instead of rewriting it."""
    docs = load_table(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.gettempdir(),
        f"orc_rt_{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)), "t")
    if not os.path.isdir(out):
        _stage_slices(
            lambda staging: docs.write.partitionBy("lang").orc(staging),
            out)
    back = spark.read.orc(out).where(F.col("lang") == "en")
    return back.select(
        "doc_id", "source", "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.md5(F.col("text").cast("binary")).alias("text_md5"))


# ------------------------------------- salted skew join (dx61)
#
# q30 salts a skewed AGGREGATION; this is the join-side twin — the
# manual remedy when one join key floods a shuffle partition and AQE's
# skew splitter can't apply (shuffled hash join, or a partial cluster
# where the skew is known ahead of time). The dim side is replicated
# SALT_N times (one explode, dim stays tiny); each fact row picks a
# deterministic salt from row-local fields, so every hot key's rows
# spread across SALT_N reducers; the join is forced to a shuffle hash
# join (the hint) to prove the pattern where it matters — result is
# bit-equal to the unsalted plain join, which is the oracle.

_SALT_N = 8

_DX61_SQL = """
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
"""


@query("dx61_salted_skew_join", sql=_DX61_SQL)
def dx61_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue through a SALTED shuffle join: dim replicated
    over salt 0..SALT_N-1 (explode — the dim grows SALT_N x, still
    tiny), fact salt = pmod(hash of row-local fields, SALT_N), join on
    (key, salt). Exact integer cents; the oracle is the plain unsalted
    join, so the hash match proves salting is result-invariant."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    salted_dim = part.select(
        "p_partkey", "p_brand",
        F.explode(F.sequence(F.lit(0), F.lit(_SALT_N - 1))).alias("salt"))
    fact = li.select(
        "l_partkey", "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
               F.lit(_SALT_N)).cast("int").alias("salt"))
    # hint on the DIM side: the hinted side is the shuffled-hash BUILD
    # side, and the per-task hash map must be the bounded dim x salt
    # replication, never the corpus-scaled fact stream (r14 build-side
    # audit after the dx65 ramp OOM — the hint previously sat on fact)
    joined = fact.join(
        salted_dim.hint("shuffle_hash"),
        (fact["l_partkey"] == salted_dim["p_partkey"])
        & (fact["salt"] == salted_dim["salt"]))
    return (joined.groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum(F.round(F.col("l_extendedprice") * 100)
                       .cast("long")).alias("revenue_cents"))
            .select(F.col("p_brand").alias("brand"),
                    F.col("cnt").cast("long").alias("cnt"),
                    F.col("revenue_cents").cast("long").alias("revenue_cents")))


# ------------------------- streaming histogram quantiles (sx10)
#
# qx48's rank-error quantile sketch is a batch one-shot; the
# streaming-friendly quantile structure is a MERGEABLE fixed-bucket
# histogram: per-batch bucket counts are algebraic partials (the sx07
# machinery verbatim — landed idempotently per batch_id, merged at
# serve time), and any quantile is answered from the cumulative
# bucket counts with a deterministic <= bucket-width error. All
# selection arithmetic is integer (permille targets, ceil-division by
# integer ops), so the served rows are bit-identical to the oracle's
# one-pass recompute.

_SX10_WIDTH = 50000          # bucket width in currency units
_SX10_BUCKETS = 12
_SX10_PERMILLE = (250, 500, 750, 900, 990)

_SX10_SQL = f"""
    WITH b AS (
      SELECT least(CAST(floor(o_totalprice / {_SX10_WIDTH}) AS BIGINT),
                   {_SX10_BUCKETS - 1}) AS bucket,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    h AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS cnt,
             min(cents) AS mn, max(cents) AS mx
      FROM b GROUP BY bucket
    ),
    c AS (
      SELECT a.bucket, a.cnt, a.mn, a.mx,
             (SELECT CAST(sum(cnt) AS BIGINT) FROM h x
              WHERE x.bucket <= a.bucket) AS cum,
             (SELECT CAST(sum(cnt) AS BIGINT) FROM h) AS tot
      FROM h a
    ),
    q AS (SELECT unnest([{", ".join(str(p) for p in _SX10_PERMILLE)}])
                   AS permille),
    sel AS (
      SELECT q.permille, min(c.bucket) AS bucket
      FROM q JOIN c
        ON c.cum >= (q.permille * c.tot + 999) // 1000
      GROUP BY q.permille
    )
    SELECT CAST(s.permille AS BIGINT) AS permille,
           round(s.permille / 1000.0, 6) AS quantile,
           c.bucket, c.cum AS cum_cnt, c.tot AS total_cnt,
           CAST(c.bucket * {_SX10_WIDTH} AS BIGINT) AS bucket_lo,
           c.mn AS bucket_min_cents, c.mx AS bucket_max_cents
    FROM sel s JOIN c ON c.bucket = s.bucket
"""


@query("sx10_stream_quantiles", sql=_SX10_SQL)
def sx10_stream_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quantile service: order totals arrive as three
    micro-batches; each lands its per-bucket algebraic partial state
    (streaming/agg_maintain.py — idempotent batch_id partitions); the
    served quantiles (p25/p50/p75/p90/p99) are computed from the
    merged histogram with integer-only rank arithmetic. The oracle is
    the one-pass batch recompute, so the hash match proves histogram
    maintenance + quantile serving are exactly replay-invariant. At
    100 TB the state is B buckets x batches rows (bytes); serving is
    a B-row triangular self-join, never a sort of history."""
    from eth_options_data_pipeline_spark.operators.incremental_agg import (
        merge_states,
    )
    from eth_options_data_pipeline_spark.streaming.agg_maintain import (
        StreamingAggMaintenance,
    )
    from eth_options_data_pipeline_spark.queries.analytics16 import (
        _stage_slices as stage,
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.least(F.floor(F.col("o_totalprice") / _SX10_WIDTH),
                F.lit(_SX10_BUCKETS - 1)).cast("long").alias("bucket"),
        "o_totalprice", "o_orderkey")
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"squant_face_{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)))
    arrivals = os.path.join(scratch, "in")
    state = os.path.join(scratch, "state")
    ckpt = os.path.join(scratch, "ckpt")
    done = os.path.join(scratch, "_done")
    maint = StreamingAggMaintenance(state, ["bucket"], "o_totalprice")
    if not os.path.isdir(arrivals):
        def _write(staging: str) -> None:
            for i in range(3):
                (orders.where(F.col("o_orderkey") % 3 == i)
                 .drop("o_orderkey").coalesce(1)
                 .write.mode("append").parquet(staging))
        stage(_write, arrivals)
    if not os.path.isdir(done):
        stream = (spark.readStream
                  .schema(orders.drop("o_orderkey").schema)
                  .option("maxFilesPerTrigger", 1).parquet(arrivals))
        q = maint.start(stream, ckpt)
        if not q.awaitTermination(300):
            raise TimeoutError("sx10 quantile stream did not finish")
        os.makedirs(done, exist_ok=True)
    h = merge_states(["bucket"],
                     spark.read.parquet(state).drop("batch_id")).select(
        "bucket", F.col("agg_cnt").alias("cnt"),
        F.col("agg_min_cents").alias("mn"), F.col("agg_max_cents").alias("mx"))
    ha, hb = h.alias("ha"), h.alias("hb")
    cum = (ha.join(hb, F.col("hb.bucket") <= F.col("ha.bucket"))
           .groupBy(F.col("ha.bucket").alias("bucket"),
                    F.col("ha.cnt").alias("cnt"),
                    F.col("ha.mn").alias("mn"), F.col("ha.mx").alias("mx"))
           .agg(F.sum("hb.cnt").cast("long").alias("cum")))
    tot = h.agg(F.sum("cnt").cast("long").alias("tot"))
    c = cum.crossJoin(F.broadcast(tot))
    qs = spark.range(1).select(F.explode(F.array(
        *[F.lit(p) for p in _SX10_PERMILLE])).alias("permille"))
    thr = ((F.col("permille") * F.col("tot") + 999) / F.lit(1000)).cast("long")
    sel = (F.broadcast(qs).join(c, c["cum"] >= thr)
           .groupBy("permille").agg(F.min("bucket").alias("bucket")))
    return (sel.join(c, "bucket")
            .select(
                F.col("permille").cast("long").alias("permille"),
                F.round(F.col("permille") / 1000.0, 6).alias("quantile"),
                "bucket",
                F.col("cum").alias("cum_cnt"),
                F.col("tot").alias("total_cnt"),
                (F.col("bucket") * _SX10_WIDTH).cast("long").alias("bucket_lo"),
                F.col("mn").alias("bucket_min_cents"),
                F.col("mx").alias("bucket_max_cents")))


# --------------------------- product-quantization ANN (vx06)
#
# Completes the similarity-search family (brute + hyperplane-LSH
# vx05, IVF vx04) with the memory-bound scale path: product
# quantization. Each 64-d vector is split into M=4 subspaces of 16
# dims; each subspace gets a k=8 codebook (seed vectors + one Lloyd
# refinement, the vx04 recipe — means rounded to 9 dp on both engines
# so assignment is bit-stable); vectors compress to M 1-byte codes;
# queries scan the COMPRESSED corpus via an asymmetric-distance
# (ADC) lookup table, then exact-rerank the top candidates. Distances
# accumulate as integer nano-units so the M-way sum is
# order-independent and engine-exact. At 100 TB the codebooks are
# M*k rows broadcast, the code table is M bytes/vector (256x smaller
# than the embeddings), the ADC join touches only codes, and the
# exact rerank reads just top-N embeddings per query.

_PQ_M = 4            # subspaces
_PQ_DSUB = 16        # dims per subspace (4 x 16 = 64)
_PQ_K = 8            # codewords per subspace (seed vec_ids 0..7)
_PQ_NQ = 3           # queries: vec_id < 3
_PQ_POOL = 10        # ADC candidate pool per query
_PQ_TOPK = 3         # final exact-reranked neighbors


def _vx06_sql() -> str:
    from eth_options_data_pipeline_spark.operators import vectors as vx

    def l2sq(a, b):
        d = f"list_transform(list_zip({a}, {b}), x -> x[1] - x[2])"
        return f"list_dot_product({d}, {d})"

    return f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sub AS (
      SELECT vec_id, m,
             e[m * {_PQ_DSUB} + 1 : m * {_PQ_DSUB} + {_PQ_DSUB}] AS sv
      FROM emb, (SELECT unnest(range({_PQ_M})) AS m)
    ),
    seeds AS (
      SELECT m, vec_id AS code, sv AS c FROM sub WHERE vec_id < {_PQ_K}
    ),
    a1 AS (
      SELECT vec_id, m, code FROM (
        SELECT s.vec_id, s.m, k.code,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY {l2sq('s.sv', 'k.c')}, k.code) AS _rk
        FROM sub s JOIN seeds k ON k.m = s.m)
      WHERE _rk = 1
    ),
    refined AS (
      SELECT m, code, list(mu ORDER BY pos) AS c
      FROM (
        SELECT a1.m, a1.code, pos, round(avg(v), 9) AS mu
        FROM a1
        JOIN sub ON sub.vec_id = a1.vec_id AND sub.m = a1.m,
             LATERAL (SELECT unnest(sub.sv) AS v,
                             generate_subscripts(sub.sv, 1) AS pos) u
        GROUP BY a1.m, a1.code, pos)
      GROUP BY m, code
    ),
    codes AS (
      SELECT vec_id, m, code FROM (
        SELECT s.vec_id, s.m, k.code,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY {l2sq('s.sv', 'k.c')}, k.code) AS _rk
        FROM sub s JOIN refined k ON k.m = s.m)
      WHERE _rk = 1
    ),
    lut AS (
      SELECT q.vec_id AS q_id, k.m, k.code,
             CAST(round({l2sq('q.sv', 'k.c')} * 1000000000) AS BIGINT)
               AS dsq_nano
      FROM sub q JOIN refined k ON k.m = q.m
      WHERE q.vec_id < {_PQ_NQ}
    ),
    adc AS (
      SELECT l.q_id, c.vec_id AS cand_id,
             CAST(sum(l.dsq_nano) AS BIGINT) AS adc_nano
      FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
      WHERE c.vec_id <> l.q_id
      GROUP BY l.q_id, c.vec_id
    ),
    pool AS (
      SELECT q_id, cand_id, adc_nano FROM (
        SELECT q_id, cand_id, adc_nano,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY adc_nano, cand_id) AS _rk
        FROM adc)
      WHERE _rk <= {_PQ_POOL}
    )
    SELECT q_id, cand_id,
           round(adc_nano / 1000000000.0, 6) AS approx_dsq,
           cos_sim, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT p.q_id, p.cand_id, p.adc_nano,
             round({vx.cosine_sql('ce.e', 'qe.e')}, 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY p.q_id
               ORDER BY {vx.cosine_sql('ce.e', 'qe.e')} DESC, p.cand_id) AS rk
      FROM pool p
      JOIN emb qe ON qe.vec_id = p.q_id
      JOIN emb ce ON ce.vec_id = p.cand_id)
    WHERE rk <= {_PQ_TOPK}
    """


@query("vx06_pq_adc", sql=_vx06_sql())
def vx06_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance scan + exact
    rerank. Codebooks: per subspace, the first k vectors seed one
    rounded-Lloyd refinement (vx04 recipe). Encoding and query LUT
    are broadcast joins against the M*k-row codebook; the ADC scan
    joins the compressed code table (M rows/vector) to the LUT and
    sums integer nano-distances (order-independent); only the
    top-POOL candidates per query touch raw embeddings again."""
    from eth_options_data_pipeline_spark.operators import vectors as vx

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"))
    ms = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m")
    sub = emb.select("vec_id", "e", ms).select(
        "vec_id", "m",
        F.slice(F.col("e"), F.col("m") * _PQ_DSUB + 1, _PQ_DSUB).alias("sv"))

    def l2sq(a, b):
        d = F.zip_with(a, b, lambda x, y: x - y)
        return vx.dot(d, d)

    def assign(svdf, cb):
        j = svdf.join(F.broadcast(cb), "m").withColumn(
            "_d", l2sq(F.col("sv"), F.col("c")))
        key = F.struct(F.col("_d"), F.col("code"))
        return (j.groupBy("vec_id", "m")
                .agg(F.min_by(F.col("code"), key).alias("code")))

    # train-once/serve-many (the vx07/dx65/vx04 artifact convention):
    # codebooks and the encoded corpus are CONSTANTS of (sf_dir) — a
    # PQ index is trained and encoded once, scanned many times, so
    # repeat invocations pay two parquet lookups instead of a Lloyd
    # refinement + two full encode passes.
    def _build_codebooks():
        seeds = (sub.where(F.col("vec_id") < _PQ_K)
                 .select("m", F.col("vec_id").alias("code"),
                         F.col("sv").alias("c")))
        a1 = assign(sub, seeds)
        return (a1.join(sub, ["vec_id", "m"])
                .select("m", "code", F.posexplode("sv").alias("pos", "v"))
                .groupBy("m", "code", "pos")
                .agg(F.round(F.avg("v"), 9).alias("mu"))
                .groupBy("m", "code")
                .agg(F.array_sort(F.collect_list(
                    F.struct("pos", "mu"))).alias("_pm"))
                .select("m", "code",
                        F.transform("_pm", lambda s: s["mu"]).alias("c")))

    refined = session_artifact(spark, "vx06_pq", sf_dir, "codebooks",
                               _build_codebooks)
    codes = session_artifact(spark, "vx06_pq", sf_dir, "codes",
                             lambda: assign(sub, refined))
    lut = (sub.where(F.col("vec_id") < _PQ_NQ)
           .select(F.col("vec_id").alias("q_id"), "m", "sv")
           .join(F.broadcast(refined), "m")
           .select("q_id", "m", "code",
                   F.round(l2sq(F.col("sv"), F.col("c")) * 1e9)
                    .cast("long").alias("dsq_nano")))
    adc = (codes.join(F.broadcast(lut), ["m", "code"])
           .where(F.col("vec_id") != F.col("q_id"))
           .groupBy("q_id", F.col("vec_id").alias("cand_id"))
           .agg(F.sum("dsq_nano").cast("long").alias("adc_nano")))
    w = Window.partitionBy("q_id").orderBy("adc_nano", "cand_id")
    pool = (adc.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= _PQ_POOL).drop("_rk"))
    qe = emb.select(F.col("vec_id").alias("q_id"), F.col("e").alias("q_e"))
    ce = emb.select(F.col("vec_id").alias("cand_id"), F.col("e").alias("c_e"))
    rer = (pool.join(F.broadcast(qe), "q_id").join(ce, "cand_id")
           .withColumn("_cos", vx.cosine(F.col("c_e"), F.col("q_e"))))
    w2 = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), "cand_id")
    return (rer.withColumn("rk", F.row_number().over(w2))
            .where(F.col("rk") <= _PQ_TOPK)
            .select("q_id", "cand_id",
                    F.round(F.col("adc_nano") / 1e9, 6).alias("approx_dsq"),
                    F.round(F.col("_cos"), 6).alias("cos_sim"),
                    F.col("rk").cast("long").alias("rk")))
