"""tools/make_ramp.py transform invariants (r13 review findings).

The scale-ramp evidence (RAMP_r13.json, bench notes) is only as good
as the synthesized data's statistical contract, and the first draft
violated it twice (repeated word-reversal replicas; a 'dimension
swap' that duplicated dims). These tests pin the contract with
DuckDB only — no Spark session, sub-second.
"""

from __future__ import annotations

import duckdb

from tools.make_ramp import _doc_text, _emb


def _one(expr: str, **params) -> object:
    return duckdb.sql(expr).fetchone()[0]


def test_doc_transforms_pairwise_distinct_and_shingle_disjoint():
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    outs = [_one(f"SELECT {_doc_text(r)} FROM (SELECT '{text}' AS text)")
            for r in range(10)]
    assert len(set(outs)) == 10  # all replicas pairwise distinct
    # every 3-word shingle carries a tagged word -> shingle sets are
    # pairwise DISJOINT across replicas
    def shingles(t):
        ws = t.split(" ")
        return {tuple(ws[i:i + 3]) for i in range(len(ws) - 2)}

    for a in range(10):
        for b in range(a + 1, 10):
            assert not (shingles(outs[a]) & shingles(outs[b])), (a, b)
    # word COUNT preserved (token statistics ride through)
    assert all(len(o.split(" ")) == 10 for o in outs)


def test_doc_transform_preserves_within_replica_exact_dups():
    text = "one two three four five six"
    for r in (1, 5, 9):
        a = _one(f"SELECT {_doc_text(r)} FROM (SELECT '{text}' AS text)")
        b = _one(f"SELECT {_doc_text(r)} FROM (SELECT '{text}' AS text)")
        assert a == b  # position-deterministic: exact dups stay exact


def test_emb_rotations_distinct_norm_and_dot_preserving():
    v = list(range(1, 65))  # 64-dim, the testdata embedding dim
    w = [x * 2 for x in v]
    base = f"SELECT {v}::FLOAT[] AS embedding"
    base_w = f"SELECT {w}::FLOAT[] AS embedding"
    outs = [tuple(_one(f"SELECT {_emb(r)} FROM ({base})"))
            for r in range(10)]
    assert len(set(outs)) == 10  # pairwise distinct rotations
    for o in outs:
        assert sorted(o) == sorted(v)  # a permutation: norm preserved
    # within-replica pairwise dot products preserved EXACTLY: the same
    # rotation applies to every vector of the replica
    for r in (1, 7):
        ov = _one(f"SELECT {_emb(r)} FROM ({base})")
        ow = _one(f"SELECT {_emb(r)} FROM ({base_w})")
        dot = sum(a * b for a, b in zip(ov, ow))
        assert dot == sum(a * b for a, b in zip(v, w))


def test_emb_families_distinct_and_dot_preserving_to_r100():
    """The sf5/sf10 ramps need up to 100 replicas; the full rotation
    range (r % 64 over the REAL 64-dim embeddings — a 32-hardcoded
    draft truncated to a non-permutation, caught by data validation
    r14) and the negation family (r >= 64) must stay pairwise
    distinct and dot-product/norm preserving like the r < 10
    rotations r13 shipped."""
    # all-distinct values so no rotation can collide with another and
    # negation can't collide with anything
    v = [float(x * x) for x in range(1, 65)]
    w = [float(3 * x + 1) for x in range(1, 65)]
    assert len(set(v)) == 64 and len(set(w)) == 64
    base = f"SELECT {v}::FLOAT[] AS embedding"
    base_w = f"SELECT {w}::FLOAT[] AS embedding"
    outs = [tuple(_one(f"SELECT {_emb(r)} FROM ({base})"))
            for r in range(100)]
    assert len(set(outs)) == 100  # all 100 replicas pairwise distinct
    for o in outs:
        assert len(o) == 64  # a 64-dim output: nothing truncated
    dot0 = sum(a * b for a, b in zip(v, w))
    for r in (0, 31, 32, 63, 64, 95, 96, 99):
        o = outs[r]
        # |values| are a permutation of the source: norm preserved
        assert sorted(abs(x) for x in o) == sorted(v)
        # negation family flips every sign, rotations none
        assert all((x < 0) == (r >= 64) for x in o)
        # within-replica pairwise dot products preserved exactly
        # (int-valued floats: no reassociation error in the test)
        ow = _one(f"SELECT {_emb(r)} FROM ({base_w})")
        assert sum(a * b for a, b in zip(o, ow)) == dot0
    import pytest
    with pytest.raises(ValueError):
        _emb(128)


def test_doc_n_chars_tracks_transformed_text():
    """The replica SELECT recomputes n_chars = length(transformed
    text) (r13 ADVICE: the tag transform lengthens text, so carrying
    the source n_chars would break the quality-proxy contract).
    Identity at r=0 because source data satisfies
    n_chars == length(text)."""
    text = "alpha beta gamma delta epsilon zeta"
    for r in (0, 3, 9, 49):
        row = duckdb.sql(
            f"SELECT {_doc_text(r)} AS text, "
            f"length({_doc_text(r)})::BIGINT AS n_chars "
            f"FROM (SELECT '{text}' AS text)").fetchone()
        assert row[1] == len(row[0])
        if r == 0:
            assert row[0] == text
        else:
            assert len(row[0]) > len(text)  # tags lengthen
