"""Multimodal query surface: binary payload metadata (oracle-checked) and
the mapInPandas feature-extraction pipeline (rows-only: binary decode is not
SQL-expressible; the driver records the weaker check by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.multimodal import attach_payload, extract_features, sample_frames
from ..session import load_tables
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ["documents"])["documents"]


@register(
    "q70_multimodal_meta",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'text'
                    WHEN doc_id % 3 = 1 THEN 'image'
                    ELSE 'audio' END AS modality,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS checksum
        FROM documents
    )
    SELECT modality,
           COUNT(*) AS n,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           MAX(n_bytes) AS max_bytes,
           COUNT(DISTINCT checksum) AS n_distinct_payloads
    FROM m GROUP BY modality
    """,
    tags=("multimodal",),
)
def q70_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: filters and stats never
    touch the bytes (the scan prunes to the metadata columns)."""
    attached = attach_payload(_docs(spark, sf_dir))
    return attached.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        F.countDistinct("checksum").alias("n_distinct_payloads"),
    )


@register(
    "q71_multimodal_features",
    oracle=None,  # binary decode via mapInPandas — not SQL-expressible
    tags=("multimodal", "rows-only"),
)
def q71_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (deterministic fake decoder, real
    Spark plumbing): per-modality mean feature norms."""
    feats = extract_features(attach_payload(_docs(spark, sf_dir)))
    norm = F.expr(
        "aggregate(features, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )
    return (
        feats.withColumn("feat_norm2", norm)
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(SUM(CAST(feat_norm2 AS DECIMAL(25,9))) AS DOUBLE)"
            ).alias("total_norm2"),
        )
    )


@register(
    "q72_frame_sampling",
    oracle=f"""
    WITH frames AS (
        SELECT doc_id,
               CAST(CEIL(CAST(octet_length(encode(text)) AS DOUBLE) / 256)
                    AS BIGINT) AS n_frames
        FROM documents
    )
    SELECT (doc_id % 3) AS modality_code,
           CAST(SUM(n_frames) AS BIGINT) AS total_frames,
           COUNT(*) AS n_docs
    FROM frames GROUP BY doc_id % 3
    """,
    tags=("multimodal", "udtf"),
)
def q72_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (the UDTF shape through mapInPandas) rolled
    up per modality. The oracle can't run the Python stage, but the frame
    COUNT is a pure function of payload length (one frame per 256-byte
    window), so the rollup is fully value-checkable — the distributed
    fan-out must produce exactly ceil(bytes/256) rows per doc."""
    mm = attach_payload(_docs(spark, sf_dir))
    frames = sample_frames(mm, every_n_bytes=256)
    return (
        frames.groupBy((F.col("doc_id") % 3).alias("modality_code"))
        .agg(
            F.count(F.lit(1)).alias("total_frames"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )
