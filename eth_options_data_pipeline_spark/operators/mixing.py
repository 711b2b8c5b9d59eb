"""Deterministic dataset mixing: combine sources at target weights,
including weights > 1 (epoch-style oversampling).

Every published pretraining mixture (The Pile's per-set epochs,
Dolma/RedPajama source weights, Llama's sampling proportions) is
"source S contributes with weight w": w = 0.3 drops 70% of S, w = 2.5
repeats every S row twice and a deterministic 50% of rows a third
time. Doing the fractional part with ``rand()`` makes every run a
different dataset; here both parts derive from md5(seed | id) — the
same machinery as sampling.py — so the mixture is byte-reproducible
and replayable in any engine with md5.

Scale shape: integer repeats are an in-row ``explode(sequence(...))``
(no shuffle, rows amplified map-side exactly where they're read);
the fractional part is one hash-threshold filter. Nothing is
collected; nothing is joined. Downstream, export_shuffle gives each
copy a distinct position via its copy-aware id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.sampling import _hash01

COPY_COL = "mix_copy"


def weight_source(df: DataFrame, id_col: str, weight: float,
                  seed: str = "mix") -> DataFrame:
    """One source at sampling weight ``weight`` (>= 0): each row kept
    ``floor(weight)`` times, plus once more for the deterministic
    ``weight - floor(weight)`` hash slice. Adds ``mix_copy``
    (0-based copy index) so repeated rows stay distinguishable —
    export_shuffle on (id, mix_copy) spreads copies across shards."""
    if weight < 0:
        raise ValueError(f"weight must be >= 0, got {weight}")
    whole = int(weight)
    frac = weight - whole
    copies = F.lit(whole) + F.when(
        _hash01(F.col(id_col), seed) < F.lit(frac), 1).otherwise(0)
    return (
        df.withColumn("_n_copies", copies)
        .where(F.col("_n_copies") > 0)
        .withColumn(COPY_COL,
                    F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)))
        .drop("_n_copies")
    )


def mix_sources(sources: dict[str, tuple[DataFrame, float]], id_col: str,
                seed: str = "mix") -> DataFrame:
    """Union of sources, each at its weight, tagged with ``mix_source``.
    Per-source seeds are derived (seed|name) so two sources sharing id
    ranges don't correlate their fractional keeps."""
    parts = []
    for name, (df, w) in sources.items():
        parts.append(
            weight_source(df, id_col, w, seed=f"{seed}|{name}")
            .withColumn("mix_source", F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
