"""Fourth-wave corpus: skew-handling (salted aggregation), char-n-gram
Jaccard, SimHash near-dup pair mining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators import text as tx
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q30_salted_agg",
    sql="""
    SELECT l_returnflag, count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q30_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for skewed keys: stage 1 groups on
    (key, salt) spreading one hot key over 16 reducers, stage 2 merges
    the partials. l_returnflag has ~3 values over the whole fact table —
    exactly the hot-key shape that stalls a single reducer at 100 TB.
    The oracle is the plain single-stage groupBy (results identical;
    sums are reassociated, hence the round-2 convention)."""
    li = t(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
    partial = (
        salted.groupBy("l_returnflag", "_salt")
        .agg(F.count(F.lit(1)).alias("_c"), F.sum("l_extendedprice").alias("_s"))
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(F.sum("_c").alias("cnt"),
             F.round(F.sum("_s"), 2).alias("sum_price"))
    )


_CHAR_SH = ("list_distinct(list_transform(range(0, greatest(length(lower(trim(text))) - 4, 1)), "
            "i -> substr(lower(trim(text)), i + 1, 5)))")

@query(
    "dx10_char_ngram_jaccard",
    sql=f"""
    WITH sh AS (SELECT doc_id, {_CHAR_SH} AS sh FROM documents WHERE doc_id < 60)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.sh, b.sh))
             / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             AS jaccard_sim
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))
            / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.5
    """,
)
def dx10_char_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 5-gram Jaccard near-dup (catches dups word-shingles
    miss: reordered words, punctuation edits). Shown brute-force over a
    bounded slice — the production path routes candidates through the
    dx07 LSH banding first; the exact-Jaccard verify stage is what this
    pins."""
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    # dynamic-start substring needs the SQL form (Column substr() wants
    # a fixed start in the lambda position)
    sh = F.array_distinct(F.expr(
        "transform(sequence(0, greatest(length(lower(trim(text))) - 4, 1) - 1), "
        "i -> substring(lower(trim(text)), i + 1, 5))"
    ))
    a = docs.select("doc_id", sh.alias("sh")).alias("a")
    b = docs.select("doc_id", sh.alias("sh")).alias("b")
    jac = tx.jaccard(F.col("a.sh"), F.col("b.sh"))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .where(jac >= 0.5)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                jac.alias("jaccard_sim"))
    )


_HS = tx.word_hashes_sql("text")

@query(
    "dx11_simhash_pairs",
    sql=f"""
    WITH h AS (SELECT doc_id, {_HS} AS hs FROM documents),
    sig AS (SELECT doc_id, {tx.simhash_terms_sql('hs')} AS simhash FROM h),
    b AS (SELECT doc_id, simhash, simhash // 65536 AS bucket FROM sig)
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
           bit_count(xor(a.simhash, c.simhash)) AS hamming
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.doc_id < c.doc_id
    WHERE bit_count(xor(a.simhash, c.simhash)) <= 6
    """,
)
def dx11_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup mining: block on the high 16 signature bits
    (near-dups almost always agree there), then exact Hamming distance
    within blocks. The block join never touches document text — only
    8-byte signatures shuffle."""
    docs = t(spark, sf_dir, "documents")
    sig = docs.select("doc_id", tx.simhash(F.col("text")).alias("simhash"))
    # cache: the self-join consumes the signatures twice, and the
    # 32-bit-vote computation is the expensive part (8 bytes/row cached)
    b = sig.withColumn("bucket", (F.col("simhash") / 65536).cast("long")).cache()
    a, c = b.alias("a"), b.alias("c")
    ham = tx.hamming32(F.col("a.simhash"), F.col("c.simhash"))
    return (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket"))
               & (F.col("a.doc_id") < F.col("c.doc_id")))
        .where(ham <= 6)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("c.doc_id").alias("doc_b"),
                ham.alias("hamming"))
    )
