#!/usr/bin/env python
"""Synthesize scale-ramp test dirs (sf0.5, sf1.0) from the driver's
sf0.1 parquet, for the VERDICT r12 item-3 scale-ramp measurement.

Replication is key-remapped (ids offset per replica so joins/groups
gain real cardinality) and, for the text/vector tables, CONTENT-
PERTURBED per replica so the dedup/ANN workload keeps its statistical
shape instead of gaining replica-count exact duplicates of every row
(transforms redesigned after r13 review — the first draft's word
reversal repeated every third replica and its "dimension swap"
duplicated dims):

  * documents: replica r tags every word at position i % 3 == 1 with
    a replica-unique suffix. Any 3 consecutive words contain >= 1
    tagged word, so EVERY word-3-gram shingle differs across replicas
    (cross-replica candidate pairs vanish from the MinHash bands),
    while WITHIN a replica the transform is position-deterministic:
    exact duplicates stay exact and aligned near-duplicates keep
    their shared shingles — dup-pair density per document stays
    ~constant as sf grows, the realistic regime;
  * embeddings: replica r applies a fixed dot-product-preserving
    transform — circular rotation of the dimension order by r % 64
    (the testdata dim, asserted at build), globally sign-NEGATED for
    r >= 64. A permutation preserves norms and every within-replica
    pairwise dot product exactly (up to float reassociation);
    negating ALL dims preserves them too ((-x)·(-y) = x·y). So the
    entire cosine/ANN workload structure is the sf0.1 one,
    replicated, while the 128 transforms are pairwise distinct and
    cross-replica vectors decorrelate;
  * relational tables: pure key offsets (dates/values unchanged —
    grouped-agg and join cardinalities scale linearly).

n_chars is recomputed as length() of the TRANSFORMED text (r13
ADVICE: the tag transform lengthens text, so carrying the source
n_chars would drift the quality-proxy statistics the 'statistical
shape preserved' contract pins; source data satisfies
n_chars == length(text), so r=0 is unchanged).

Dims (nation/region) are copied as-is. Output under /tmp/sframp:
sf0.5 (5 replicas) and sf1.0 (10 replicas) by default; pass sf names
on the command line to build others (sf5 = 50, sf10 = 100 replicas,
for the r14 big-sf ramp).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/sframp"

# key offsets: far above any sf0.1 id, per-replica stride
DOC_STRIDE = 1_000_000
VEC_STRIDE = 1_000_000
ORD_STRIDE = 10_000_000
CUST_STRIDE = 1_000_000
PART_STRIDE = 1_000_000
SUPP_STRIDE = 1_000_000
EVT_STRIDE = 10_000_000
USER_STRIDE = 1_000_000


def _doc_text(r: int) -> str:
    """Word-level transform for replica r (identity for r=0): tag
    every 3rd word (1-based positions 1, 4, 7, ...) with a
    replica-unique suffix, so every 3-word shingle carries the tag —
    shingle sets are pairwise disjoint ACROSS replicas, preserved
    WITHIN one (position-deterministic: exact dups stay exact)."""
    if r == 0:
        return "text"
    return ("list_aggregate(list_transform(string_split(text, ' '), "
            f"(w, i) -> CASE WHEN i % 3 = 1 THEN w || '{r}q' "
            "ELSE w END), 'string_agg', ' ')")


_EMB_DIM = 64  # the driver testdata's embedding dimension, asserted
               # at build time — a silent mismatch would truncate the
               # transform into a non-permutation (caught r14: a
               # 32-hardcoded reversal family dropped half the norm)


def _emb(r: int) -> str:
    """Fixed dot-product-preserving transform for replica r
    (identity for r=0): rotate the dimension order by r % 64,
    globally negated for r >= 64. A rotation is a permutation, so
    norms and every within-replica pairwise dot product are
    preserved exactly (up to float reassociation of the sum order);
    global negation preserves them too ((-x)·(-y) = x·y). The 128
    transforms are pairwise distinct on generic vectors (rotation
    offsets differ; negation flips every sign)."""
    if r >= 2 * _EMB_DIM:
        raise ValueError(
            f"embedding transform families support r < {2 * _EMB_DIM}")
    if r == 0:
        return "embedding"
    k = r % _EMB_DIM
    rot = (f"(embedding[{k + 1}:] || embedding[:{k}])" if k
           else "(embedding)")
    if r >= _EMB_DIM:  # negation family
        return f"list_transform({rot}, x -> -x)::FLOAT[]"
    return f"{rot}::FLOAT[]"


def build(out_dir: str, replicas: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    dims = [d for (d,) in con.execute(
        "SELECT DISTINCT len(embedding) FROM "
        f"read_parquet('{SRC}/embeddings.parquet')").fetchall()]
    if dims != [_EMB_DIM]:
        raise ValueError(
            f"embeddings are {dims}-dim, transforms assume {_EMB_DIM}; "
            "update _EMB_DIM or the transforms truncate silently")
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")

    def rep(table: str, select_fmt) -> None:
        parts = " UNION ALL ".join(
            f"SELECT {select_fmt(r)} FROM "
            f"read_parquet('{SRC}/{table}.parquet')"
            for r in range(replicas))
        con.execute(f"COPY ({parts}) TO '{out_dir}/{table}.parquet' "
                    "(FORMAT PARQUET)")

    rep("documents", lambda r: (
        f"doc_id + {r * DOC_STRIDE} AS doc_id, {_doc_text(r)} AS text, "
        # n_chars tracks the TRANSFORMED text (identity at r=0: the
        # source satisfies n_chars == length(text)), keeping every
        # n_chars-derived quality proxy consistent with what a real
        # corpus of this text would report (r13 ADVICE)
        f"lang, source, length({_doc_text(r)})::BIGINT AS n_chars"))
    rep("embeddings", lambda r: (
        f"vec_id + {r * VEC_STRIDE} AS vec_id, {_emb(r)} AS embedding, "
        "label"))
    rep("lineitem", lambda r: (
        f"l_orderkey + {r * ORD_STRIDE} AS l_orderkey, "
        f"l_partkey + {r * PART_STRIDE} AS l_partkey, "
        f"l_suppkey + {r * SUPP_STRIDE} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate"))
    rep("orders", lambda r: (
        f"o_orderkey + {r * ORD_STRIDE} AS o_orderkey, "
        f"o_custkey + {r * CUST_STRIDE} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"))
    rep("customer", lambda r: (
        f"c_custkey + {r * CUST_STRIDE} AS c_custkey, c_name, "
        "c_nationkey, c_acctbal, c_mktsegment"))
    rep("supplier", lambda r: (
        f"s_suppkey + {r * SUPP_STRIDE} AS s_suppkey, s_name, "
        "s_nationkey, s_acctbal"))
    rep("part", lambda r: (
        f"p_partkey + {r * PART_STRIDE} AS p_partkey, p_name, p_brand, "
        "p_type, p_size, p_retailprice"))
    rep("events", lambda r: (
        f"event_id + {r * EVT_STRIDE} AS event_id, ts, "
        f"user_id + {r * USER_STRIDE} AS user_id, event_type, value, "
        "props"))
    con.close()
    print(f"built {out_dir} ({replicas} replicas)")


REPLICAS = {"sf0.5": 5, "sf1.0": 10, "sf5": 50, "sf10": 100}


if __name__ == "__main__":
    names = sys.argv[1:] or ["sf0.5", "sf1.0"]
    for name in names:
        build(os.path.join(OUT, name), REPLICAS[name])
    sys.exit(0)
