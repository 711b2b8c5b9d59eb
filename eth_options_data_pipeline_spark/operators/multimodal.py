"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
`modality` discriminator and typed metadata (schemas.MULTIMODAL_ASSET).
Decode / feature-extraction runs as Arrow-batched Pandas iterators via
``mapInPandas`` — the Spark-side plumbing (schema, batching, partition
preservation) is real and tested; the actual image/audio decoding is
stubbed behind ``decode_asset`` because codec libraries are not
available in this environment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

ASSET_FEATURES = StructType([
    StructField("asset_id", LongType()),
    StructField("modality", StringType()),
    StructField("n_bytes", LongType()),
    StructField("checksum", StringType()),
])


def decode_asset(content: bytes, modality: str) -> dict:
    """Real decode (image resize / audio resample / video frame-sample).

    STUB: codec libraries (PIL/ffmpeg/librosa) are not in this
    container. The deterministic metadata path below (byte length +
    md5) is the engine-side contract; swap this body for the real
    decoder when codecs are available.
    """
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "environment; use extract_features() for the metadata path"
    )


def extract_features(assets: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    Deterministic fake 'decode': byte length + md5 checksum — enough to
    exercise the real distributed plumbing (binary columns through
    Arrow, per-partition batch iteration, fixed output schema) and to
    be oracle-checked. A real decoder plugs into the same iterator.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame({
                "asset_id": pdf[id_col].astype("int64"),
                "modality": pdf["modality"],
                "n_bytes": content.map(len).astype("int64"),
                "checksum": content.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
            })

    return assets.mapInPandas(batches, schema=ASSET_FEATURES)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table as a synthetic asset corpus
    (utf-8 bytes as payload, modality cycled by id) so the multimodal
    path is exercisable against driver testdata."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
