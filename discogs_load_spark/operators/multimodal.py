"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Spark-side design for image/audio/video at 100 TB:

- payloads are opaque ``binary`` columns (or object-store URIs for > ~1 MB
  blobs, keeping parquet row groups scannable);
- typed metadata (modality, byte length, checksum) travels alongside so
  filters/partition pruning never touch the bytes;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — per-batch Python, schema declared up front,
  partition-parallel.

The actual codecs (PIL/ffmpeg/etc.) are NOT in this container, so
:func:`decode_image` is an explicit NotImplementedError stub and
:func:`extract_features` substitutes a deterministic sha256-derived fake
feature vector — the Spark plumbing (schema, batching, partitioning) is real
and tested; only the codec call is swapped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 8


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table from the documents fixture: binary
    payload + modality/byte-length/checksum metadata columns."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "text")
        .when(F.col("doc_id") % 3 == 1, "image")
        .otherwise("audio")
    )
    return df.select(
        "doc_id",
        modality.alias("modality"),
        F.col(text_col).cast("binary").alias("payload"),
        F.octet_length(text_col).alias("n_bytes"),
        F.sha2(F.col(text_col), 256).alias("checksum"),
    )


def decode_image(payload_bytes: bytes) -> object:
    """STUB: image decode requires PIL/opencv, not present in this
    environment. The mapInPandas pipeline calls a decoder with this
    signature; swap in the real codec on a cluster image."""
    raise NotImplementedError(
        "image decode needs PIL/opencv on the executors; "
        "extract_features uses a deterministic fake instead"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a feature extractor: 8 floats from the
    sha256 digest, scaled to [0, 1)."""
    import hashlib

    digest = hashlib.sha256(payload).digest()
    return [b / 256.0 for b in digest[:FEATURE_DIM]]


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real plumbing: mapInPandas with an explicit output schema, one Python
    worker per partition, Arrow transfer both ways. The per-payload function
    is the deterministic fake (see module docstring).
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    schema = (
        "doc_id bigint, modality string, n_bytes int, features array<float>"
    )

    def run(batches):
        for pdf in batches:
            out = pdf[["doc_id", "modality", "n_bytes"]].copy()
            out["features"] = [
                _fake_features(bytes(p)) for p in pdf["payload"]
            ]
            yield out

    return df.mapInPandas(run, schema=schema)
