"""Approximate string join (entity resolution): match keys across two
tables within a Levenshtein edit-distance budget, without the
cartesian product.

Classic q-gram blocking (Gravano et al. 2001, "Approximate String
Joins in a Database (Almost) for Free"): two strings within edit
distance d share at least one positional q-gram once they're padded —
an edit operation destroys at most q grams, so strings with
max(|s|,|t|) + q - 1 - q*d > 0 surviving grams must collide on some
gram. Blocking on shared trigrams therefore loses NO true pair for
any realistic (length, d) combination, and the expensive verify
(levenshtein, JVM built-in) runs only on candidates.

The bound only bites when the strings are long enough: it needs
max(|s|,|t|) + q - 1 - q*d >= 1. Pairs where BOTH keys are shorter
than q*d - q + 2 chars have no guaranteed shared gram (e.g. "aa" vs
"zz" at d=2 share nothing), so keys at or below that threshold also
emit one sentinel "short" gram — every short×short pair then collides
through the same hash join, restoring exactness without a nested-loop
side path. The bound depends only on max(|s|,|t|), so any unguaranteed
pair has BOTH keys under the threshold and both carry the sentinel:
the sentinel covers every pair the trigram bound can miss.

Scale shape: each side explodes to (trigram, id) — grams of the KEY
only, not the row — and candidates come from a hash join on the gram,
deduped on the id pair before verify. A length pre-filter
(abs(|s|-|t|) <= d, a necessary condition) prunes candidates before
levenshtein. Very common grams are non-discriminating and quadratic
(the LSH_BUCKET_CAP situation); ``block_cap`` drops grams shared by
more than cap keys — recall then rests on the RAREST shared gram,
which the q-gram bound makes overwhelmingly likely to survive; leave
it None for the exact guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Q = 3
_PAD_L = "\x02" * (Q - 1)
_PAD_R = "\x03" * (Q - 1)
_SHORT = "\x01SHORT"  # sentinel bucket for keys below the gram-bound floor


def _grams(key: Column, max_distance: int) -> Column:
    """Distinct padded trigrams of a key, as an array column.

    Keys of length <= Q*d - Q + 1 sit below the q-gram bound's floor
    (max length + Q - 1 - Q*d < 1), so they also get the _SHORT
    sentinel gram; see module docstring.
    """
    padded = F.concat(F.lit(_PAD_L), key, F.lit(_PAD_R))
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.length(padded) - (Q - 1)),
        lambda i: padded.substr(i, F.lit(Q))))
    floor = Q * max_distance - Q + 1
    if floor < 1:  # d == 0: every 1+-char pair shares all its grams
        return grams
    return F.when(F.length(key) <= F.lit(floor),
                  F.concat(grams, F.array(F.lit(_SHORT)))).otherwise(grams)


def _gram_table(df: DataFrame, id_col: str, key_col: str,
                side: str, max_distance: int) -> DataFrame:
    return (
        df.select(F.col(id_col).alias(f"{side}_id"),
                  F.col(key_col).alias(f"{side}_key"))
        .withColumn("gram", F.explode(_grams(F.col(f"{side}_key"),
                                             max_distance)))
    )


def fuzzy_join_pairs(left: DataFrame, right: DataFrame,
                     left_id: str = "id", left_key: str = "key",
                     right_id: str = "id", right_key: str = "key",
                     max_distance: int = 2,
                     block_cap: int | None = None) -> DataFrame:
    """(left_id, left_key, right_id, right_key, distance) for every
    cross-table pair with levenshtein(left_key, right_key) <=
    max_distance. Exact (no lost pairs) while block_cap is None."""
    lg = _gram_table(left, left_id, left_key, "l", max_distance)
    rg = _gram_table(right, right_id, right_key, "r", max_distance)
    if block_cap is not None:
        hot = (
            lg.select("gram", "l_id").distinct()
            .groupBy("gram").agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > block_cap).select("gram")
        )
        lg = lg.join(F.broadcast(hot), "gram", "left_anti")
        rg = rg.join(F.broadcast(hot), "gram", "left_anti")
    cands = (
        lg.join(rg, "gram")
        .where(F.abs(F.length("l_key") - F.length("r_key"))
               <= F.lit(max_distance))
        .select("l_id", "l_key", "r_id", "r_key")
        .distinct()
    )
    return (
        cands.withColumn("distance", F.levenshtein("l_key", "r_key"))
        .where(F.col("distance") <= F.lit(max_distance))
        .select(F.col("l_id").alias("left_id"), F.col("l_key").alias("left_key"),
                F.col("r_id").alias("right_id"), F.col("r_key").alias("right_key"),
                "distance")
    )
