"""Multimodal query surface: binary payload metadata, the mapInPandas
frame-sampling fan-out, and a REAL BMP decode pipeline — all oracle-checked
(q71's procedural pixel rule makes even the binary decode SQL-recomputable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.multimodal import (
    attach_payload,
    decode_image_stats,
    render_procedural_bmp,
    sample_frames,
)
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


_Q71_W, _Q71_H = 18, 7  # 18*3 = 54 bytes/row → 2 pad bytes: padding exercised


@register(
    "q71_multimodal_features",
    oracle=f"""
    SELECT d.doc_id,
           CAST({_Q71_W} AS INT) AS width,
           CAST({_Q71_H} AS INT) AS height,
           CAST(SUM(CASE WHEN g.k % 3 = 0
                         THEN (d.doc_id * 31 + g.k) % 256 END) AS BIGINT) AS r_sum,
           CAST(SUM(CASE WHEN g.k % 3 = 1
                         THEN (d.doc_id * 31 + g.k) % 256 END) AS BIGINT) AS g_sum,
           CAST(SUM(CASE WHEN g.k % 3 = 2
                         THEN (d.doc_id * 31 + g.k) % 256 END) AS BIGINT) AS b_sum
    FROM documents d, generate_series(0, {_Q71_W * _Q71_H * 3 - 1}) AS g(k)
    WHERE d.doc_id % 3 = 1
    GROUP BY d.doc_id
    """,
    tags=("multimodal",),
)
def q71_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the Arrow-batched pipeline, end to end:
    each image-modality doc gets a procedurally-rendered 24-bit BMP
    (pixel channel k = (doc_id*31 + k) % 256 over the top-down RGB
    array), and :func:`decode_image_stats` parses the file bytes back —
    BGR swap, bottom-up row order, 4-byte row padding — into per-doc
    integer channel sums. The oracle recomputes the sums analytically
    from the generation rule, so any decoder byte-layout bug (channel
    order, row direction, padding stride) hash-mismatches. Replaces the
    pre-r05 sha-fake (the repo's last rows-only-by-stub query)."""
    images = attach_payload(_docs(spark, sf_dir)).filter(
        F.col("modality") == "image"
    )
    rendered = render_procedural_bmp(
        images.select("doc_id"), _Q71_W, _Q71_H
    )
    return decode_image_stats(rendered)


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
    FROM frames
    WHERE n_frames > 0
    GROUP BY doc_id % 3
    """,
    tags=("multimodal", "udtf"),
)
def q72_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (the UDTF shape through mapInPandas) rolled
    up per modality. The oracle can't run the Python stage, but the frame
    COUNT is a pure function of payload length (one frame per 256-byte
    window), so the rollup is fully value-checkable — the distributed
    fan-out must produce exactly ceil(bytes/256) rows per doc. A doc with
    an EMPTY payload emits zero frames, so it is absent from the fan-out;
    the oracle's ``WHERE n_frames > 0`` matches that semantic exactly
    (tests/test_llm_ops.py pins the empty-payload case)."""
    mm = attach_payload(_docs(spark, sf_dir))
    frames = sample_frames(mm, every_n_bytes=256)
    return (
        frames.groupBy((F.col("doc_id") % 3).alias("modality_code"))
        .agg(
            F.count(F.lit(1)).alias("total_frames"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


_Q181_W, _Q181_H = 16, 16  # divisible by the 8x8 aHash grid
_Q181_SEEDS = 40  # image family count: doc_id % 40 picks the base image
_Q181_WRAP = 200  # pixel base range; 199 + max shift 6 = 205 <= 255
_Q181_SHIFTS = 7  # per-doc uniform brightness shift: doc_id % 7


@register(
    "q181_image_phash_dedup",
    oracle=f"""
    WITH px AS (
        SELECT d.doc_id,
               ((g.k // 3) // {_Q181_W}) // {_Q181_H // 8} AS by,
               ((g.k // 3) % {_Q181_W}) // {_Q181_W // 8} AS bx,
               ((d.doc_id % {_Q181_SEEDS}) * 31 + g.k) % {_Q181_WRAP}
                   + (d.doc_id % {_Q181_SHIFTS}) AS v
        FROM documents d,
             generate_series(0, {_Q181_W * _Q181_H * 3 - 1}) AS g(k)
        WHERE d.doc_id % 3 = 1
    ),
    blocks AS (
        SELECT doc_id, by, bx, SUM(v) AS bsum
        FROM px GROUP BY doc_id, by, bx
    ),
    tot AS (SELECT doc_id, SUM(bsum) AS tsum FROM blocks GROUP BY doc_id),
    bits AS (
        SELECT b.doc_id, b.by * 8 + b.bx AS pos,
               CASE WHEN b.bsum * 64 > t.tsum THEN '1' ELSE '0' END AS bit
        FROM blocks b JOIN tot t ON b.doc_id = t.doc_id
    ),
    hashes AS (
        SELECT doc_id, STRING_AGG(bit, '' ORDER BY pos) AS phash
        FROM bits GROUP BY doc_id
    )
    SELECT phash,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           array_to_string(list_sort(list(doc_id))[1:32], '|') AS members
    FROM hashes GROUP BY phash HAVING COUNT(*) >= 2
    ORDER BY phash
    """,
    tags=("multimodal", "dedup", "perceptual-hash"),
)
def q181_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (aHash) image dedup through the REAL codec: each
    image doc renders a 24-bit BMP from a closed-form rule that plants
    NEAR-duplicate families — doc_ids sharing doc_id % {_Q181_SEEDS} get
    the same base image, each brightened by a per-doc uniform shift
    (doc_id % {_Q181_SHIFTS}) — then :func:`image_ahash` decodes the
    bytes back and computes the integer block-mean/global-mean bit
    signature. The shift leaves every aHash bit unchanged (both sides of
    the cross-multiplied compare move together), so the hash groups the
    shift-distinct family members an exact-checksum dedup CANNOT see.
    Scope of that contrast: (seed, shift) is injective over doc_ids
    below lcm({_Q181_SEEDS}, {_Q181_SHIFTS}) * 3 = 840, so within that
    range family payloads are pairwise byte-distinct
    (tests/test_llm_ops.py pins it there); larger fixtures recycle the
    {_Q181_SEEDS * _Q181_SHIFTS} (seed, shift) combos, so families then
    ALSO contain exact byte-duplicates — which the perceptual hash
    groups regardless (aHash groups are a superset of checksum groups
    by construction). The oracle recomputes
    the full hash analytically from the generation rule, so any decoder
    or hash-layout bug (BGR order, row flip, block indexing, bit order)
    hash-mismatches.

    Scale shape: render/decode/hash are all 1-row-in-1-row-out Arrow
    stages (no shuffle); the only exchange is the phash groupBy, and the
    member lists ride the capped rank-before-collect rollup, so a viral
    duplicate family of a billion images ships {32} ids, not a billion."""
    from ..operators.dedup import capped_member_rollup
    from ..operators.multimodal import image_ahash

    images = attach_payload(_docs(spark, sf_dir)).filter(
        F.col("modality") == "image"
    )
    meta = images.select(
        "doc_id",
        (F.col("doc_id") % _Q181_SEEDS).alias("seed"),
        (F.col("doc_id") % _Q181_SHIFTS).alias("shift"),
    )
    rendered = render_procedural_bmp(
        meta,
        _Q181_W,
        _Q181_H,
        seed_col="seed",
        wrap=_Q181_WRAP,
        shift_col="shift",
    )
    hashes = image_ahash(rendered)
    return (
        capped_member_rollup(hashes, "phash", "doc_id")
        .filter(F.col("n_members") >= 2)
        .orderBy("phash")
    )
