"""Round-5 corpus faces, part 3.

* dx54 — Population Stability Index between a reference and a current
  window: the "did my training-data distribution move?" gate, with
  fixed bucket edges, 1e-6 smoothing, per-bucket terms.
* cx02 — training-export manifest: split → temperature-mix →
  deterministic shard+order as one plan.
* dx55 — BPE merge-selection pair statistics on the word-frequency
  table (the Sennrich scale trick).
* sx07 — streaming materialized-view maintenance served from
  partial-state landings (streaming/agg_maintain.py).
* sx08 — streaming CDC apply: foreachBatch MERGE equals the one-shot
  relational merge (streaming/cdc_apply.py).
* qx50 — the SQL-string surface: one query string runs verbatim on
  both engines.
* cx03 — quality-ensemble gate: classifier + perplexity + heuristics
  with an engine-independent weighted vote.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table

def _stage_slices(write_slices, target: str) -> None:
    """Write multi-slice scratch input ATOMICALLY: land every slice in
    ``<target>_staging`` then os.rename the finished tree into place.
    The target directory therefore either doesn't exist or holds ALL
    slices — a crash mid-loop leaves only a staging tree that the next
    invocation discards and rebuilds, never a partial tree that a
    ``isdir(target)`` guard would mistake for complete."""
    import shutil
    staging = target + "_staging"
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    write_slices(staging)
    os.rename(staging, target)


_PSI_CUT = "1996-01-01"
_PSI_WIDTH = 60000
_PSI_BUCKETS = 10
_PSI_EPS = 1e-6

_PSI_SQL = f"""
    WITH b AS (
      SELECT least(CAST(floor(o_totalprice / {_PSI_WIDTH}) AS BIGINT),
                   {_PSI_BUCKETS - 1}) AS bucket,
             CASE WHEN o_orderdate < TIMESTAMP '{_PSI_CUT}'
                  THEN 1 ELSE 0 END AS is_ref
      FROM orders
    ),
    c AS (
      SELECT bucket,
             CAST(sum(is_ref) AS BIGINT) AS nref,
             CAST(sum(1 - is_ref) AS BIGINT) AS ncur
      FROM b GROUP BY bucket
    ),
    t AS (
      SELECT CAST(sum(nref) AS BIGINT) AS tref,
             CAST(sum(ncur) AS BIGINT) AS tcur
      FROM c
    )
    SELECT bucket,
           round(p, 6) AS p_ref, round(q, 6) AS p_cur,
           round((p - q) * ln(p / q), 6) AS psi_term
    FROM (
      SELECT bucket,
             greatest(nref / CAST(tref AS DOUBLE), {_PSI_EPS}) AS p,
             greatest(ncur / CAST(tcur AS DOUBLE), {_PSI_EPS}) AS q
      FROM c, t
    )
"""


@query("dx54_drift_psi", sql=_PSI_SQL)
def dx54_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index, per fixed-width bucket, between the
    pre-cutoff reference window and the post-cutoff current window of
    o_totalprice. One scan, one 10-row groupBy, a broadcast of the
    two totals — the whole monitor costs a single aggregation over
    the delta at 100 TB. Shares are smoothed at 1e-6 before the log
    so empty buckets alert instead of dividing by zero; the PSI term
    is computed from UNROUNDED shares and rounded once, identically
    on both engines."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderdate")
    cut = F.lit(_PSI_CUT).cast("timestamp")
    b = orders.select(
        F.least(F.floor(F.col("o_totalprice") / _PSI_WIDTH),
                F.lit(_PSI_BUCKETS - 1)).alias("bucket"),
        F.when(F.col("o_orderdate") < cut, 1).otherwise(0).alias("is_ref"),
    )
    c = b.groupBy("bucket").agg(
        F.sum("is_ref").alias("nref"),
        F.sum(1 - F.col("is_ref")).alias("ncur"),
    )
    t = c.agg(F.sum("nref").alias("tref"), F.sum("ncur").alias("tcur"))
    p = F.greatest(F.col("nref") / F.col("tref").cast("double"),
                   F.lit(_PSI_EPS))
    q = F.greatest(F.col("ncur") / F.col("tcur").cast("double"),
                   F.lit(_PSI_EPS))
    return (
        c.crossJoin(F.broadcast(t))
        .select("bucket", p.alias("p"), q.alias("q"))
        .select("bucket",
                F.round("p", 6).alias("p_ref"),
                F.round("q", 6).alias("p_cur"),
                F.round((F.col("p") - F.col("q"))
                        * F.log(F.col("p") / F.col("q")), 6)
                 .alias("psi_term"))
    )


# --------------------------------------- training export pipeline (cx02)
#
# The second composition face (cx01 is curation): the EXPORT half of
# a training-data pipeline, three oracle-proven operators chained as
# one lazy plan:
#
#   1. train/val split          (operators/splits.split_column — the
#      seeded 15-hex-digit md5 band; val is frozen BEFORE any
#      oversampling so eval rows are never duplicated);
#   2. temperature mixing       (operators/mixing.temperature_mix —
#      n^0.5 weights derived from the TRAIN side's own histogram);
#   3. deterministic shard + order (operators/export_shuffle.
#      assign_shards over the copy-aware id, position = rank of the
#      permutation key within the shard).
#
# The output is the export MANIFEST: every training copy's (shard,
# position) plus the held-out rows — enough to replay the exact byte
# order of an export at any scale. One exchange per stage boundary
# that needs one (dedup-free here): the mix amplifies in-row, the
# shard assignment is the single corpus-wide exchange.

_CX02_SHARDS = 8
_CX02_TRAIN = 0.9

_CX02_SQL = f"""
    WITH spl AS (
      SELECT doc_id, source,
             CASE WHEN CAST(('0x' || substr(md5('split-v1|' ||
                      CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  / 1152921504606846976.0 < {_CX02_TRAIN}
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    ),
    n AS (SELECT source, count(*) AS ns FROM spl
          WHERE split = 'train' GROUP BY source),
    z AS (SELECT sum(pow(ns, 0.5)) AS z, sum(ns) AS nt FROM n),
    w AS (SELECT source, round(nt * pow(ns, 0.5) / z / ns, 9) AS wt
          FROM n, z),
    cop AS (
      SELECT s.doc_id, s.source, w.wt,
             CAST(floor(w.wt) AS BIGINT)
             + CASE WHEN CAST(('0x' || substr(md5(
                      'tmix|' || s.source || '|' || CAST(s.doc_id AS VARCHAR)
                    ), 1, 13)) AS BIGINT) / 4503599627370496.0
                    < w.wt - floor(w.wt)
                    THEN 1 ELSE 0 END AS cop
      FROM spl s JOIN w USING (source) WHERE s.split = 'train'
    ),
    train AS (
      SELECT doc_id, CAST(unnest(range(0, cop)) AS INT) AS mix_copy
      FROM cop
    ),
    keyed AS (
      SELECT doc_id, mix_copy,
             md5('export-v1|' || CAST(doc_id AS VARCHAR) || '#'
                 || CAST(mix_copy AS VARCHAR)) AS k
      FROM train
    ),
    sharded AS (
      SELECT doc_id, mix_copy, k,
             CAST(CAST(('0x' || substr(k, 1, 8)) AS BIGINT)
                  % {_CX02_SHARDS} AS INT) AS shard
      FROM keyed
    )
    SELECT 'train' AS split, doc_id, mix_copy, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY k)
                AS INT) AS pos
    FROM sharded
    UNION ALL
    SELECT 'val' AS split, doc_id, 0 AS mix_copy, -1 AS shard, -1 AS pos
    FROM spl WHERE split = 'val'
"""


@query("cx02_export_pipeline", sql=_CX02_SQL)
def cx02_export_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export manifest: split → temperature-mix the train
    side → deterministic shard + intra-shard order, as ONE lazy plan.
    Every stage is an existing oracle-proven operator; the hash match
    pins the inter-stage contracts (val frozen before oversampling,
    weights from the train histogram only, copy-aware permutation
    ids)."""
    from pyspark.sql import Window
    from eth_options_data_pipeline_spark.operators.export_shuffle import (
        KEY_COL, SHARD_COL, assign_shards,
    )
    from eth_options_data_pipeline_spark.operators.mixing import (
        temperature_mix,
    )
    from eth_options_data_pipeline_spark.operators.splits import split_column

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    spl = docs.withColumn(
        "split", split_column(F.col("doc_id"),
                              {"train": _CX02_TRAIN, "val": 1 - _CX02_TRAIN}))
    train = spl.where(F.col("split") == "train")
    mixed = temperature_mix(train, source_col="source", id_col="doc_id",
                            alpha=0.5, seed="tmix")
    eid = F.concat_ws("#", F.col("doc_id").cast("string"),
                      F.col("mix_copy").cast("string"))
    sharded = assign_shards(mixed.withColumn("_eid", eid), "_eid",
                            "export-v1", _CX02_SHARDS)
    w = Window.partitionBy(SHARD_COL).orderBy(KEY_COL)
    out_train = sharded.select(
        F.lit("train").alias("split"), "doc_id",
        F.col("mix_copy").cast("int").alias("mix_copy"),
        F.col(SHARD_COL).alias("shard"),
        F.row_number().over(w).cast("int").alias("pos"))
    out_val = spl.where(F.col("split") == "val").select(
        F.lit("val").alias("split"), "doc_id",
        F.lit(0).alias("mix_copy"), F.lit(-1).alias("shard"),
        F.lit(-1).alias("pos"))
    return out_train.unionByName(out_val)


# --------------------------------------- BPE pair statistics (dx55)
#
# Vocabulary induction: the merge-selection statistic of BPE training
# (operators/bpe.py). Counts ride the word-frequency table — the
# Sennrich scale trick — so the corpus is scanned once and every
# later round is bounded by |vocab|, not corpus tokens.

_BPE_K = 20

_BPE_SQL = f"""
    WITH words AS (
      SELECT unnest(string_split(trim(text), ' ')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    vocab AS (
      SELECT w, count(*) AS freq FROM words
      WHERE w <> '' GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, CAST(i AS INT), 2) AS pair, freq
      FROM (SELECT w, freq, unnest(range(1, length(w))) AS i
            FROM vocab WHERE length(w) >= 2)
    ),
    agg AS (
      SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
      FROM pairs GROUP BY pair
    )
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT)
             AS rank, pair, cnt
    FROM agg ORDER BY rank LIMIT {_BPE_K}
"""


@query("dx55_bpe_pairs", sql=_BPE_SQL)
def dx55_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 BPE merge candidates: adjacent character pairs weighted
    by word frequency, counted on the distinct-word table (one corpus
    scan + two bounded aggregations + TakeOrdered)."""
    from eth_options_data_pipeline_spark.operators.bpe import pair_statistics
    docs = load_table(spark, sf_dir, "documents").select("text")
    return pair_statistics(docs, "text", k=_BPE_K)


# ------------------------------ streaming MV maintenance (sx07)
#
# Batch face of streaming/agg_maintain.py: orders arrive as three
# micro-batches; each lands its exact-integer partial state in its
# own batch_id partition (idempotent replay); the face serves the
# maintained aggregate. The oracle recomputes from scratch in one
# pass — the hash match extends the dx53 maintenance invariant
# across micro-batch landings and the parquet state roundtrip.

def _sx07_sql() -> str:
    from eth_options_data_pipeline_spark.queries.analytics15 import _INCR_SQL
    return _INCR_SQL


@query("sx07_agg_maintain_stream", sql=_sx07_sql())
def sx07_agg_maintain_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized-view maintenance, served: three order
    micro-batches stream through foreachBatch partial-state landings
    (availableNow + checkpoint), then the maintained aggregate is
    finalized from the state table. Eager at construction like
    qx46/qx47; the scratch (arrivals + state + checkpoint) is
    per-session and the stream runs once."""
    from eth_options_data_pipeline_spark.streaming.agg_maintain import (
        StreamingAggMaintenance,
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"aggmaint_face_{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)))
    arrivals = os.path.join(scratch, "in")
    state = os.path.join(scratch, "state")
    ckpt = os.path.join(scratch, "ckpt")
    done = os.path.join(scratch, "_done")
    maint = StreamingAggMaintenance(state, ["o_orderpriority"],
                                    "o_totalprice")
    # arrivals and stream guarded SEPARATELY: the arrivals tree is
    # staged and renamed into place (so it exists only when complete),
    # and the stream is gated on a _done marker written only after
    # awaitTermination — a crash mid-stream resumes from the
    # checkpoint instead of serving a partial state table
    if not os.path.isdir(arrivals):
        def _write(staging: str) -> None:
            for i in range(3):
                (orders.where(F.col("o_orderkey") % 3 == i).coalesce(1)
                 .write.mode("append").parquet(staging))
        _stage_slices(_write, arrivals)
    if not os.path.isdir(done):
        stream = (spark.readStream.schema(orders.schema)
                  .option("maxFilesPerTrigger", 1).parquet(arrivals))
        q = maint.start(stream, ckpt)
        if not q.awaitTermination(300):
            raise TimeoutError("sx07 maintenance stream did not finish")
        os.makedirs(done, exist_ok=True)
    return maint.current(spark)


# ------------------------------------ streaming CDC apply (sx08)
#
# Batch face of streaming/cdc_apply.py: the qx46 merge scenario run
# THROUGH a change stream — base table written once, the update slice
# arrives as three micro-batches, each MERGEd on arrival; the face
# aggregates the read-back. The oracle is qx46's relational merge
# statement, so the hash match proves per-batch streaming application
# equals the one-shot relational MERGE.

def _sx08_sql() -> str:
    from eth_options_data_pipeline_spark.queries.analytics8 import _MERGE_SQL
    return _MERGE_SQL


@query("sx08_cdc_apply_stream", sql=_sx08_sql())
def sx08_cdc_apply_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upserts: change records (doubled-price order slices)
    stream in three micro-batches through foreachBatch MERGE into the
    partitioned base table; the served aggregate must equal the
    one-shot relational merge. Eager at construction (qx46/qx47/sx07
    pattern), per-session scratch, stream runs once."""
    from eth_options_data_pipeline_spark.streaming.cdc_apply import (
        StreamingCdcApply,
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"cdc_face_{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)))
    table = os.path.join(scratch, "table")
    arrivals = os.path.join(scratch, "changes")
    ckpt = os.path.join(scratch, "ckpt")
    done = os.path.join(scratch, "_done")
    updates = orders.where(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") * 2, 2))
    # The arrivals tree is staged and renamed into place so it exists
    # only when complete; the base-table overwrite happens BEFORE the
    # rename, so `isdir(arrivals)` implies base AND all change slices
    # are fully written. The stream can only have started after the
    # rename, so re-running this block never clobbers applied merges.
    if not os.path.isdir(arrivals):
        base = orders.where(F.col("o_orderkey") % 3 != 0)
        base.write.mode("overwrite").partitionBy(
            "o_orderpriority").parquet(table)

        def _write(staging: str) -> None:
            for i in range(3):
                (updates.where(F.col("o_orderkey") % 3 == i).coalesce(1)
                 .write.mode("append").parquet(staging))
        _stage_slices(_write, arrivals)
    if not os.path.isdir(done):
        changes = (spark.readStream.schema(updates.schema)
                   .option("maxFilesPerTrigger", 1).parquet(arrivals))
        q = StreamingCdcApply(table, ("o_orderkey",),
                              "o_orderpriority").start(changes, ckpt)
        if not q.awaitTermination(300):
            raise TimeoutError("sx08 CDC stream did not finish")
        os.makedirs(done, exist_ok=True)
    back = spark.read.parquet(table)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# ------------------------------------------- SQL surface (qx50)
#
# Every other face declares its plan through the DataFrame API; this
# one drives the engine through the SQL string surface (temp views +
# spark.sql) with a query written in the dialect subset BOTH engines
# parse identically — proving a SQL-first user of the engine gets the
# same Catalyst plans (the optimizer is shared, so pushdown/broadcast
# posture is identical to the DataFrame twin q19/q32).

_QX50_SQL = """
    SELECT n.n_name AS nation,
           count(*) AS cnt,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F' AND l.l_quantity >= 10
    GROUP BY n.n_name
    HAVING count(*) >= 5
"""


@query("qx50_sql_surface", sql=_QX50_SQL)
def qx50_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine driven through SQL strings: register the tables as
    temp views, run the joined-aggregate-HAVING query verbatim. The
    oracle runs the IDENTICAL string in DuckDB — one source of truth,
    two engines."""
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_QX50_SQL)


# ---------------------------------------- quality ensemble (cx03)
#
# The third composition face: the quality DECISION a curation
# pipeline actually ships is never one signal — it's an ensemble of
# the model score (dx41's frozen classifier, here UN-gated), the LM
# perplexity (dx35's Stupid Backoff bigram, squashed through a
# logistic), and cheap heuristics (token floor + stopword-ratio
# band). Each component is rounded to 6 decimals BEFORE the weighted
# vote, so the ensemble arithmetic sees identical doubles on both
# engines and the keep/drop decision is engine-independent.

_ENS_STOPS = ("the", "a", "of", "and", "to", "in", "is", "on",
              "for", "it")
_ENS_TAU = 8.0      # perplexity logistic midpoint (log2 ppl)
_ENS_W = (0.5, 0.3, 0.2)


def _cx03_sql() -> str:
    from eth_options_data_pipeline_spark.queries.analytics11 import _PPL_SQL
    from eth_options_data_pipeline_spark.queries.analytics12 import (
        _CLF_BIAS, _CLF_VALUES,
    )
    stops = ", ".join(f"'{s}'" for s in _ENS_STOPS)
    return f"""
    WITH w(token, wt) AS (VALUES {_CLF_VALUES}),
    toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    z AS (
      SELECT t.doc_id, sum(w.wt) AS z
      FROM toks t JOIN w ON w.token = t.token GROUP BY 1
    ),
    cls AS (
      SELECT d.doc_id,
             round(1.0 / (1.0 + exp(-({_CLF_BIAS!r} + coalesce(z.z, 0.0)))), 6)
               AS p_cls
      FROM documents d LEFT JOIN z ON z.doc_id = d.doc_id
    ),
    ppl AS (SELECT * FROM ({_PPL_SQL}) q),
    heur AS (
      SELECT doc_id,
             CAST(CASE WHEN n_words >= 20
                            AND stop_ratio BETWEEN 0.05 AND 0.8
                       THEN 1.0 ELSE 0.0 END AS DOUBLE) AS heur_ok
      FROM (
        SELECT doc_id, len(ws) AS n_words,
               len(list_filter(ws, x -> x IN ({stops})))
                 / CAST(len(ws) AS DOUBLE) AS stop_ratio
        FROM (SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
              FROM documents)
      )
    )
    SELECT c.doc_id, c.p_cls,
           round(1.0 / (1.0 + exp(round(p.log_ppl, 6) - {_ENS_TAU!r})), 6)
             AS p_ppl,
           h.heur_ok,
           round({_ENS_W[0]!r} * c.p_cls
                 + {_ENS_W[1]!r} * round(1.0 / (1.0 + exp(round(p.log_ppl, 6)
                                                          - {_ENS_TAU!r})), 6)
                 + {_ENS_W[2]!r} * h.heur_ok, 6) AS ensemble,
           round({_ENS_W[0]!r} * c.p_cls
                 + {_ENS_W[1]!r} * round(1.0 / (1.0 + exp(round(p.log_ppl, 6)
                                                          - {_ENS_TAU!r})), 6)
                 + {_ENS_W[2]!r} * h.heur_ok, 6) >= 0.5 AS keep
    FROM cls c JOIN ppl p ON p.doc_id = c.doc_id
    JOIN heur h ON h.doc_id = c.doc_id
    """


@query("cx03_quality_ensemble", sql=_cx03_sql())
def cx03_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble quality gate: frozen-classifier probability (un-gated
    dx41 scorer), logistic-squashed bigram perplexity (dx35 scorer),
    and a heuristic token-floor/stopword band, combined 0.5/0.3/0.2
    with every component rounded before the vote. Two doc_id joins
    over per-doc score tables; each component keeps its own proven
    scale shape (broadcast weights; LM joined on natural keys)."""
    from eth_options_data_pipeline_spark.operators.classifier_filter import (
        score_frozen_linear,
    )
    from eth_options_data_pipeline_spark.operators.lm_quality import (
        frozen_bigram_lm, score_perplexity,
    )
    from eth_options_data_pipeline_spark.queries.analytics12 import (
        _CLF_BIAS, _CLF_WEIGHTS,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cls = score_frozen_linear(docs, _CLF_WEIGHTS, _CLF_BIAS).select(
        "doc_id", F.round("quality_prob", 6).alias("p_cls"))
    bigrams, unigrams, total = frozen_bigram_lm(
        spark, sf_dir, docs.where(F.col("doc_id") % 3 != 0))
    ppl = score_perplexity(docs, bigrams, unigrams, total).select(
        "doc_id", F.round("log_ppl", 6).alias("log_ppl"))
    ws = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    # chained ==/| predicate (Column.isin miscompiles inside
    # higher-order-function lambdas — see verify-skill gotchas)
    stop_ratio = (F.size(F.filter(ws, lambda x: _stop_pred(x)))
                  / F.size(ws).cast("double"))
    heur = docs.select(
        "doc_id",
        F.when((F.size(ws) >= 20)
               & stop_ratio.between(0.05, 0.8), 1.0)
         .otherwise(0.0).alias("heur_ok"))
    p_ppl = F.round(1.0 / (1.0 + F.exp(F.col("log_ppl") - F.lit(_ENS_TAU))), 6)
    joined = (cls.join(ppl, "doc_id").join(heur, "doc_id")
              .withColumn("p_ppl", p_ppl))
    ens = F.round(F.lit(_ENS_W[0]) * F.col("p_cls")
                  + F.lit(_ENS_W[1]) * F.col("p_ppl")
                  + F.lit(_ENS_W[2]) * F.col("heur_ok"), 6)
    return joined.select(
        "doc_id", "p_cls", "p_ppl", "heur_ok",
        ens.alias("ensemble"), (ens >= 0.5).alias("keep"))


def _stop_pred(x):
    cond = None
    for s in _ENS_STOPS:
        c = (x == s)
        cond = c if cond is None else (cond | c)
    return cond
