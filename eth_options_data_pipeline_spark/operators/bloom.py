"""Broadcast Bloom-filter pre-screen for membership-heavy joins.

The scale problem this solves: the contamination screen
(operators/contamination.py) broadcasts the benchmark's *string*
n-gram table. That works while the eval suite is megabytes; it stops
working when the reference set is itself large (a 10 GB dedup
blocklist, a multi-benchmark union, an URL denylist) — the broadcast
would carry every string. A Bloom filter replaces the string table
with a fixed-size bitset: ``m`` bits carry an arbitrary number of
members at ~16 bits/element for a ~0.5 % false-positive rate, a
100-1000x reduction over the strings themselves. The probe side then
prunes map-side — only rows whose k hash bits are ALL set ever reach
the (exact) confirm join, so the expensive join runs on the tiny
surviving slice.

Correctness contract: a Bloom filter has NO false negatives. Every
true member passes the bit test, so pruning-then-exact-confirm returns
exactly the same rows as the exact join alone — the filter only
changes the plan, never the answer. (``tests/test_bloom.py`` pins
both halves: result equality with the unpruned path, and strict
pruning at test scale.)

Plan shape (100 TB probe side): the bitset is built on the SMALL side
only — hash each member k times, OR the bits per 64-bit word with a
map-side-combinable ``bit_or`` — yielding at most ``m/64`` rows, which
broadcast. The probe performs k successive broadcast-hash joins
(word lookup) each immediately filtered on the bit, so the row stream
thins at every step and nothing ever shuffles. Spark's own runtime
``InjectRuntimeFilter`` bloom only fires on equi-join keys it can
prove selective; this operator is the explicit, composable version for
when the build side is a different table than the join demands
(n-grams of the benchmark vs n-grams of the corpus).

No counterpart in the reference (row-oriented options pipeline,
main.py:43-351); Bloom-filter decontamination at corpus scale is the
published pattern (e.g. Dolma / CCNet use Bloom filters for dedup and
decontamination passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16 bits/element with k=3 probes -> false-positive rate ~0.5 %
_BITS_PER_ELEMENT = 16
_MIN_BITS = 1 << 12
_MAX_BITS = 1 << 24  # 2 MiB bitset = 262144 longs; still broadcast-cheap


def sized_bits(n_elements: int) -> int:
    """Power-of-two bitset size for ``n_elements`` members.

    ~16 bits/element, clamped to [2^12, 2^24]. Deterministic in the
    member count only, so both a re-run and an oracle replay size the
    filter identically.
    """
    target = max(_MIN_BITS, _BITS_PER_ELEMENT * max(n_elements, 1))
    m = _MIN_BITS
    while m < target and m < _MAX_BITS:
        m <<= 1
    return m


def _word_and_bit(col, seed: int, m_bits: int):
    """(word index, bit mask) of hash ``seed`` for value ``col``."""
    pos = F.pmod(F.xxhash64(F.lit("bloom"), F.lit(seed), col), F.lit(m_bits))
    word = (pos / 64).cast("int")
    # call_function: F.shiftleft only takes a literal python int for
    # the shift amount, but the bit index is per-row
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), pos.cast("int") % 64)
    return word, mask


def bloom_build(members: DataFrame, col: str, m_bits: int,
                k: int = 3) -> DataFrame:
    """Aggregate the members into a (word, bits) bitset table.

    One row per 64-bit word that has at least one bit set — at most
    ``m_bits/64`` rows regardless of member count. ``bit_or`` is
    map-side combinable, so the only exchange carries partial words.
    """
    seeded = members.select(
        F.col(col).alias("_member"),
        F.explode(F.array(*[F.lit(s) for s in range(k)])).alias("_seed"))
    pos = F.pmod(
        F.xxhash64(F.lit("bloom"), F.col("_seed"), F.col("_member")),
        F.lit(m_bits))
    words = seeded.select(
        (pos / 64).cast("int").alias("word"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), pos.cast("int") % 64)
        .alias("mask"))
    return words.groupBy("word").agg(F.bit_or("mask").alias("bits"))


def bloom_prune(probe: DataFrame, col: str, bloom: DataFrame, m_bits: int,
                k: int = 3) -> DataFrame:
    """Keep only probe rows whose value passes all ``k`` bit tests.

    ``k`` successive broadcast-hash joins against the bitset table,
    each filtered immediately — a probe value hashing to an absent
    word (inner join miss) or an unset bit drops on the spot, so the
    stream thins at every step and the probe side never shuffles.
    Returns a SUPERSET of the true members present in ``probe``
    (false positives possible, false negatives impossible).
    """
    out = probe
    for seed in range(k):
        word, mask = _word_and_bit(F.col(col), seed, m_bits)
        b = bloom.select(F.col("word").alias(f"_w{seed}"),
                         F.col("bits").alias(f"_b{seed}"))
        out = (out.join(F.broadcast(b), word == F.col(f"_w{seed}"))
               .where(F.col(f"_b{seed}").bitwiseAND(mask) == mask)
               .drop(f"_w{seed}", f"_b{seed}"))
    return out
