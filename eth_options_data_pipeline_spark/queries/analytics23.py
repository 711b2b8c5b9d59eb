"""Round-13 face: the end-to-end pretraining-corpus composition (cx05).

VERDICT r12 item 6: chain the already-green families as ONE lazy
plan — curation (cx01's five stages) -> tokenize under the frozen
dx67 unigram model (dx68's segmentation walk) -> greedy pack (dx38's
kernel) -> export manifest (cx02's deterministic shard+order
convention) — proving the families compose without driver
materialization between stages, the way a real 100 TB pipeline runs
them. Every stage is individually oracle-checked in its own face; the
composition oracle is the staged CTE chain, reusing each stage's SQL
verbatim (_CX01_CTES, _DX68_SEG_CTES, pack_walk_ctes).

No counterpart in the reference (row-oriented options pipeline,
main.py:43-351); this face is the capstone of the
training-data-curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.packing import pack_documents
from eth_options_data_pipeline_spark.queries.analytics11 import pack_walk_ctes
from eth_options_data_pipeline_spark.queries.analytics13 import (
    _CX01_CTES, _cx01_stages,
)
from eth_options_data_pipeline_spark.queries.analytics21 import (
    _DX68_SEG_CTES, _segmented_lexicon_frozen,
)
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table

_CX05_BUDGET = 150   # pack budget, in unigram pieces
_CX05_SHARDS = 4     # packing shards (parallel greedy streams)
_CX05_ESHARDS = 2    # export shards


_CX05_SQL = f"""
    WITH RECURSIVE {_CX01_CTES},
    {_DX68_SEG_CTES},
    docw AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents
        WHERE doc_id IN (SELECT doc_id FROM cx_kept))
      WHERE word <> ''
    ),
    wpiece AS (SELECT word, CAST(len(pieces) AS BIGINT) AS n_pieces FROM seg),
    doctok AS (
      SELECT CAST(d.doc_id AS BIGINT) AS _id,
             CAST(sum(coalesce(w.n_pieces, 1)) AS BIGINT) AS _tok
      FROM docw d LEFT JOIN wpiece w USING (word)
      GROUP BY d.doc_id
    ),
    {pack_walk_ctes('doctok', _CX05_BUDGET, _CX05_SHARDS, 'cx05')},
    packs AS (
      SELECT _id AS doc_id, shard, pack_seq,
             shard * {1 << 40} + pack_seq AS pack_id,
             offset_in_pack, pack_tokens
      FROM pk_walk
    ),
    exp AS (
      SELECT *, md5('cx05e|' || CAST(pack_id AS VARCHAR)) AS ek,
             CAST(('0x' || substr(md5('cx05e|' || CAST(pack_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_CX05_ESHARDS} AS export_shard
      FROM packs
    )
    SELECT doc_id, pack_tokens - offset_in_pack AS ug_tokens,
           shard, pack_seq, offset_in_pack, export_shard,
           CAST(row_number() OVER (PARTITION BY export_shard
                                   ORDER BY ek, offset_in_pack, doc_id)
                AS BIGINT) AS export_pos
    FROM exp
"""


@query("cx05_corpus_composition", sql=_CX05_SQL)
def cx05_corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curate -> tokenize -> pack -> export, ONE lazy plan:

      1. **curation** (cx01's stages, reused as code): lang gate ->
         quality gate -> exact dedup -> MinHash-LSH screen -> token
         budget selection; yields the kept doc_id set;
      2. **tokenize** (the frozen dx67 unigram model, dx68's walk):
         each kept doc's whitespace words left-join the segmented
         lexicon (a <= 200-row broadcast) — lexicon words cost their
         optimal-path piece count, out-of-lexicon words fall back to
         one whole-word piece (the documented honest bound of the
         bounded-lexicon model); per-doc sum = unigram token count;
      3. **pack** (dx38's kernel): greedy fixed-budget packing of the
         tokenized docs in {_CX05_SHARDS} independent md5-ordered
         shard streams (the plan's single Arrow stage);
      4. **export manifest** (cx02's convention): packs land in
         export shards by md5 of pack_id; every doc's manifest row is
         (export_shard, export_pos) under the deterministic
         (pack key, offset) order — enough to replay exact bytes.

    No driver materialization between stages: stages 1-2 and 4 are
    pure Catalyst transforms around the one applyInPandas pack
    kernel; the only collect anywhere is the bounded frozen-model
    literal load inside dx68's segmentation helper (<= vocab-size
    rows, the train-once/serve-many artifact convention). Plan
    pinned in tests/test_cx05.py: exactly one FlatMapGroupsInPandas,
    no other Python, no cartesian product, broadcast piece lookup.

    The oracle chains each stage's own SQL verbatim — the CTE lists
    are shared module constants, so face and composition can never
    drift apart silently."""
    kept = _cx01_stages(spark, sf_dir).select("doc_id")
    # The piece-count lookup is the frozen segmented lexicon — a
    # <= lexicon-size constant of (corpus, frozen model) — loaded as
    # LITERALS (the dx68 bounded model-load convention) instead of a
    # broadcast-join side. The per-doc token count then folds IN-ROW
    # over the word array: the former explode -> broadcast join ->
    # groupBy(doc_id) pair of stages (and the doc_id exchange between
    # them) disappears from the plan entirely; sums are exact BIGINTs,
    # so the fold is value-identical to the grouped sum (r16, guide
    # §2.4 "remove shuffles outright"). Membership is preserved: docs
    # whose word array is all-empty never reached the groupBy before,
    # so the fold guards on `exists(words, w != '')`.
    wp_rows = _segmented_lexicon_frozen(spark, sf_dir).select(
        "word", F.size("pieces").cast("long").alias("n_pieces")).collect()
    piece_of = {r["word"]: int(r["n_pieces"]) for r in wp_rows}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.split(F.lower(F.col("text")), " ")
    if piece_of:
        pmap = F.create_map(*[F.lit(x) for kv in sorted(piece_of.items())
                              for x in kv])
        n_pieces_of = lambda w: F.coalesce(pmap[w], F.lit(1).cast("long"))  # noqa: E731
    else:  # empty lexicon: every word costs its whole-word fallback 1
        n_pieces_of = lambda w: F.lit(1).cast("long")  # noqa: E731
    tok_fold = F.aggregate(
        ws, F.lit(0).cast("long"),
        lambda acc, w: acc + F.when(w == "", F.lit(0).cast("long"))
        .otherwise(n_pieces_of(w)))
    doc_tok = (
        docs.join(kept, "doc_id", "left_semi")
        .where(F.exists(ws, lambda w: w != ""))
        .select("doc_id", tok_fold.alias("ug_tokens"))
    )
    packed = pack_documents(doc_tok, "doc_id", "ug_tokens",
                            budget=_CX05_BUDGET, n_shards=_CX05_SHARDS,
                            seed="cx05")
    ek = F.md5(F.concat(F.lit("cx05e|"), F.col("pack_id").cast("string")))
    exp = packed.withColumn("_ek", ek).withColumn(
        "export_shard",
        F.pmod(F.conv(F.substring("_ek", 1, 8), 16, 10).cast("long"),
               F.lit(_CX05_ESHARDS)))
    w = Window.partitionBy("export_shard").orderBy(
        "_ek", "offset_in_pack", "doc_id_packed")
    return exp.select(
        F.col("doc_id_packed").alias("doc_id"),
        (F.col("pack_tokens") - F.col("offset_in_pack")).alias("ug_tokens"),
        "shard", "pack_seq", "offset_in_pack",
        "export_shard",
        F.row_number().over(w).cast("long").alias("export_pos"),
    )
