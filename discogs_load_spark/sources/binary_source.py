"""Binary-file source: ingest a directory of opaque media files (images /
audio / video) as a payload table — the missing first stage of the
multimodal pipeline (operators/multimodal.py starts from an already-built
payload column; this builds it from a lake directory).

Built on Spark's ``binaryFile`` data source: one row per file with
(path, modificationTime, length, content), predicate pushdown on the
path/length metadata (``pathGlobFilter``, length filters prune before any
byte is read), partition-parallel over files. At 100 TB the same reader
shape applies — media lakes are many-small-files, so the source's
file-listing parallelism and an explicit ``recursiveFileLookup`` matter
more than split tuning (a single media blob is one row, never split).

Modality is derived from the file extension — the standard layout
convention (s3://lake/images/..jpg) — and payloads above ``max_bytes``
are left as URI-only rows (content dropped, keep the pointer): the
parquet-row-group-bloat guard the multimodal module docstring describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EXT_MODALITY = {
    "jpg": "image",
    "jpeg": "image",
    "png": "image",
    "gif": "image",
    "wav": "audio",
    "mp3": "audio",
    "flac": "audio",
    "mp4": "video",
    "mkv": "video",
    "webm": "video",
    "txt": "text",
    "md": "text",
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int = 1 << 20,
) -> DataFrame:
    """Directory of media files → (uri, modality, n_bytes, checksum,
    payload) with checksum and payload NULL (URI-only) beyond
    ``max_bytes``.

    Two scans unioned so the cap prunes BEFORE any byte is read: the
    payload scan filters ``length <= max_bytes`` (binaryFile pushes
    length predicates into the file listing, so over-cap files are
    skipped, not read-then-dropped), and the metadata scan never selects
    ``content`` (column pruning — binaryFile only stats the files). On a
    media lake with a few multi-GB outliers the outliers therefore cost a
    listing entry, not a full read; the price is that over-cap rows carry
    no checksum (they carry no bytes either — callers that need one must
    raise the cap).

    Assumption: the directory is STATIC for the duration of the read (the
    two file listings are independent, not atomic — a file created,
    deleted, or resized across the cap between them can be dropped or
    double-counted). That holds for fixture dirs and immutable lake
    drops; for a live landing directory, list once yourself and branch on
    the cached ``length`` column instead."""

    def _scan() -> DataFrame:
        reader = (
            spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
        )
        if glob:
            reader = reader.option("pathGlobFilter", glob)
        return reader.load(path)

    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    modality_expr = F.lit("binary")
    for e, m in EXT_MODALITY.items():
        modality_expr = F.when(ext == e, m).otherwise(modality_expr)
    meta_cols = [
        F.col("path").alias("uri"),
        modality_expr.alias("modality"),
        F.col("length").cast("bigint").alias("n_bytes"),
    ]
    small = _scan().filter(F.col("length") <= max_bytes).select(
        *meta_cols,
        F.sha2(F.col("content"), 256).alias("checksum"),
        F.col("content").alias("payload"),
    )
    big = _scan().filter(F.col("length") > max_bytes).select(
        *meta_cols,
        F.lit(None).cast("string").alias("checksum"),
        F.lit(None).cast("binary").alias("payload"),
    )
    return small.unionByName(big)
