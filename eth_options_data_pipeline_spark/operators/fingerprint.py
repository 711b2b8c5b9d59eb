"""Content-defined chunking (CDC) fingerprints via polynomial rolling
hash — the shift-robust fingerprinting face.

dx02's whole-document digest changes completely when one byte shifts;
MinHash (dx07) is robust but probabilistic. CDC is the deterministic
middle ground used by dedup storage systems (LBFS, restic, borg) and
data-pipeline near-dup detection: chunk boundaries are declared where
a rolling hash of the trailing window hits a modulus condition, so
boundaries move WITH the content — inserting a sentence changes the
chunks it touches and no others, and unchanged chunks keep identical
digests. Matching chunk digests across documents then expose
shifted/partially-edited duplicates that fixed-offset hashing misses.

Implementation: the per-document chunking is one Arrow-batched
mapInPandas pass (plain Python over each text — the rolling recurrence
is inherently sequential per document, the classic "per-row imperative
kernel" case the engine reserves Pandas paths for). Emitted chunk
digests are md5, so downstream group-bys shuffle 32-byte digests,
never text — the same 100 TB shape as dx01's exact dedup.

Rolling hash: H_i = (H_{i-1} * B + c_i - c_{i-w} * B^w) mod M over a
w-char window (Rabin-Karp form), boundary when H_i % D == D - 1,
with min/max chunk-length clamps like real CDC systems use to bound
chunk-size variance.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# the mapInPandas kernel closes over module-level chunk_boundaries;
# without by-value pickling, workers spawned from a non-repo cwd (the
# driver contract) can't import this module back
try:
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover - older pickle APIs
    pass
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

B = 257            # polynomial base
M = (1 << 31) - 1  # modulus (Mersenne prime)
WINDOW = 16        # rolling window chars
DIVISOR = 64       # boundary when H % DIVISOR == DIVISOR-1 (~64-char chunks)
MIN_CHUNK = 24
MAX_CHUNK = 256

CHUNK_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("chunk_idx", LongType()),
    StructField("chunk_start", LongType()),
    StructField("chunk_len", LongType()),
    StructField("chunk_digest", StringType()),
])


def chunk_boundaries(text: str) -> list[int]:
    """End offsets (exclusive) of every CDC chunk of ``text``."""
    n = len(text)
    if n == 0:
        return []
    bw = pow(B, WINDOW, M)
    bounds = []
    h = 0
    start = 0
    for i, ch in enumerate(text):
        h = (h * B + ord(ch)) % M
        if i - start >= WINDOW:
            h = (h - ord(text[i - WINDOW]) * bw) % M
        length = i - start + 1
        at_cut = h % DIVISOR == DIVISOR - 1
        if (length >= MIN_CHUNK and at_cut) or length >= MAX_CHUNK:
            bounds.append(i + 1)
            start = i + 1
            h = 0
    if start < n:
        bounds.append(n)
    return bounds


def cdc_chunks(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Explode documents into content-defined chunks with md5 digests
    (fan-out mapInPandas; one pass per document)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in CHUNK_SCHEMA.fields}
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                prev = 0
                for idx, end in enumerate(chunk_boundaries(text)):
                    piece = text[prev:end]
                    out["doc_id"].append(int(doc_id))
                    out["chunk_idx"].append(idx)
                    out["chunk_start"].append(prev)
                    out["chunk_len"].append(len(piece))
                    out["chunk_digest"].append(
                        hashlib.md5(piece.encode()).hexdigest())
                    prev = end
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(batches, schema=CHUNK_SCHEMA)


def shifted_dup_pairs(chunks: DataFrame, min_shared: int = 2) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` chunk digests — the
    shifted-duplicate detector. Shuffles digests only (32 bytes/row):
    group by digest, emit intra-bucket pairs, count shared digests per
    pair. Giant buckets (boilerplate chunks) are inherently bounded by
    chunk uniqueness; a cap like dx10's can be layered on if a corpus
    has pathological boilerplate."""
    from pyspark.sql import functions as F

    a = chunks.select(F.col("doc_id").alias("doc_a"), "chunk_digest")
    b = chunks.select(F.col("doc_id").alias("doc_b"), "chunk_digest")
    return (
        a.join(b, "chunk_digest")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("chunk_digest").alias("shared_chunks"))
        .where(F.col("shared_chunks") >= min_shared)
    )


def scrub_duplicate_chunks(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Corpus-wide duplicated-SUBSTRING removal (the Lee et al.
    "Deduplicating Training Data" operation, on CDC chunks instead of
    suffix arrays): every chunk whose digest occurs more than once in
    the corpus survives only at its first occurrence (min (doc_id,
    chunk_idx)); later occurrences are cut out and each document's text
    is rebuilt from its surviving spans, in order.

    Scale shape: the chunking pass emits digests + offsets (never
    text); the keep/drop decision is one group-by on the digest; the
    rebuild joins the surviving offset lists back to the docs table by
    id and re-slices each text with an in-row array fold — the corpus
    body crosses the wire exactly once, for the final join. Suffix
    arrays find duplicates at every length; CDC trades that
    completeness for linear passes and mergeable state, catching
    copied spans >= the chunk size (~DIVISOR chars).

    Returns the docs with ``text_scrubbed`` and ``n_chunks_removed``.
    """
    from pyspark.sql import functions as F

    chunks = cdc_chunks(docs, id_col, text_col)
    first = chunks.groupBy("chunk_digest").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("_first"),
        F.count(F.lit(1)).alias("_occ"))
    kept = (
        chunks.join(first, "chunk_digest")
        .where((F.col("_occ") == 1)
               | ((F.col("doc_id") == F.col("_first.doc_id"))
                  & (F.col("chunk_idx") == F.col("_first.chunk_idx"))))
        .select("doc_id", "chunk_idx", "chunk_start", "chunk_len")
    )
    spans = kept.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_start", "chunk_len")))
        .alias("_spans"),
        F.count(F.lit(1)).alias("_n_kept"),
    ).withColumnRenamed("doc_id", "_sid")
    total = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n_chunks"),
    ).withColumnRenamed("doc_id", "_tid")

    rebuilt = F.aggregate(
        F.col("_spans"), F.lit(""),
        lambda acc, s: F.concat(
            acc, F.substring(F.col(text_col),
                             s["chunk_start"] + 1, s["chunk_len"])))
    return (
        docs.join(spans, docs[id_col] == spans["_sid"], "left")
        .join(total, docs[id_col] == total["_tid"], "left")
        .select(
            docs[id_col], F.col(text_col),
            # three cases: doc produced no chunks at all (empty text —
            # keep as-is); every chunk was a later occurrence (scrub to
            # empty); normal rebuild from surviving spans
            F.when(F.col("_n_chunks").isNull(), F.col(text_col))
             .when(F.col("_spans").isNull(), F.lit(""))
             .otherwise(rebuilt).alias("text_scrubbed"),
            F.coalesce(F.col("_n_chunks") - F.coalesce(F.col("_n_kept"), F.lit(0)),
                       F.lit(0)).alias("n_chunks_removed"),
        )
    )
