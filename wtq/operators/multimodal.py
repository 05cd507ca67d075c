"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` (the pattern a training-data pipeline needs at 100 TB:
binary stays off the driver, batches stream through Python workers).

The actual codecs are NOT in this container, so ``decode_image`` is a
clearly-marked stub (NotImplementedError) and ``extract_features``
uses a deterministic fake decode — the Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 4

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        # first feature kept at full double precision for the oracle
        # check (the float32 embedding would lose digits vs SQL)
        T.StructField("f0", T.DoubleType()),
    ]
)


def decode_image(blob: bytes):
    """Real decoder would go here (PIL/libvips not in this container)."""
    raise NotImplementedError("image codecs unavailable in this environment — stub")


def _fake_embed(blob: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-content feature vector."""
    h = hashlib.sha256(blob).digest()
    return [int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(FEATURE_DIM)]


def with_blob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in 'media' table: payload bytes + metadata struct."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).alias("n_chars"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": blobs.map(len).astype("int32"),
                    "content_sha256": blobs.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "embedding": blobs.map(_fake_embed),
                    "f0": blobs.map(lambda b: _fake_embed(bytes(b))[0]),
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def multimodal_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    feats = extract_features(with_blob(df, id_col, text_col))
    return feats.select(
        "doc_id",
        "byte_len",
        "content_sha256",
        F.round("f0", 6).alias("f0"),
    )


def sql_multimodal_features(table: str, id_col: str, text_col: str) -> str:
    """Oracle for the SQL-expressible part (byte length + sha256 of
    the payload); the fake embedding's first component is
    sha256-derived so it is oracle-checkable too."""
    return f"""
    SELECT {id_col} AS doc_id,
           CAST(octet_length(encode({text_col})) AS INT) AS byte_len,
           sha256({text_col}) AS content_sha256,
           round(CAST(('0x' || substr(sha256({text_col}), 1, 8)) AS BIGINT) / 4294967296.0, 6) AS f0
    FROM {table}
    """
