"""Multimodal-column queries (north-star X6) over binary payloads derived
from the documents fixture (no media libs in container — see
operators/multimodal.py for the real/fake decoder split)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators.multimodal import (
    attach_binary,
    decode_media_meta,
    extract_features,
    frame_sample,
)
from pdf_parse_vector_db_spark.plans.registry import QuerySpec
from pdf_parse_vector_db_spark.sources.registry import load_table


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata projection: byte length + content digest of
    each payload — pure Catalyst over the binary column (oracle-checked;
    both engines hash the same UTF-8 bytes)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    media = attach_binary(docs)
    return media.select(
        "doc_id",
        "kind",
        F.length(F.col("content")).cast("bigint").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id,
       'image' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha
FROM documents
"""


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing: binary → typed media metadata (kinds
    alternate image/video by doc parity). Rows-only: the fake decoder's
    byte-math isn't worth porting to SQL; determinism is tested instead."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    media = attach_binary(docs).withColumn(
        "kind", F.when(F.col("doc_id") % 2 == 0, "image").otherwise("video")
    )
    return decode_media_meta(media).orderBy("doc_id")


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing: binary → unit-norm float vector; the
    output column is ANN-ready (same shape the embeddings table has)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    media = attach_binary(docs)
    feats = extract_features(media, dim=64)
    return feats.select(
        "doc_id",
        F.size("feature").alias("dim"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("feature").cast("array<double>"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
            4,
        ).alias("norm"),
    ).orderBy("doc_id")


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling UDTF accounting: sampled frame rows per kind."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    media = attach_binary(docs).withColumn(
        "kind", F.when(F.col("doc_id") % 2 == 0, "image").otherwise("video")
    )
    frames = frame_sample(media, every_n=10)
    return (
        frames.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("kind")
    )


QUERIES = [
    QuerySpec("multimodal_meta", multimodal_meta, MULTIMODAL_META_SQL, "X6 binary metadata"),
    QuerySpec("multimodal_decode", multimodal_decode, None, "X6 decode plumbing (rows-only)"),
    QuerySpec("multimodal_features", multimodal_features, None, "X6 feature extraction (rows-only)"),
    QuerySpec("multimodal_frames", multimodal_frames, None, "X6 frame sampling (rows-only)"),
]
