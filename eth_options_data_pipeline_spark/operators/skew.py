"""Skew-handling join (SURVEY §4.3 scale posture).

AQE's skew-join splitting handles sort-merge skew automatically; this
explicit salted join is the deterministic fallback for the worst case —
a large⋈large equi-join where one key dominates: the probe side gets a
random-but-deterministic salt, the build side is replicated once per
salt value, and the join key becomes (key, salt), spreading the hot key
over `salts` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(large: DataFrame, other: DataFrame, on: str, salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join with the hot-key shuffle spread over `salts` buckets.

    ``large`` gets salt = pmod(hash(all columns), salts) — deterministic
    per row, uniform per key; ``other`` is replicated `salts` times
    (acceptable when the other side is much smaller than the skewed
    side but too big to broadcast). Result equals ``large.join(other,
    on, how)`` exactly.
    """
    salt_col = F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(salts))
    l_salted = large.withColumn("_salt", salt_col)
    o_replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return l_salted.join(o_replicated, on=[on, "_salt"], how=how).drop("_salt")
