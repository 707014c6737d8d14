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


def resize_images(
    df: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """Arrow-batched image resize stage (1 row in → 1 row out).

    Plumbing is real: mapInPandas, declared schema, partition-parallel.
    The codec call is the stub — a real deployment swaps the body for
    PIL/opencv decode→resize→re-encode. The fake output is deterministic:
    payload sha256 re-keyed with the target dims, n_bytes = w*h*3 (RGB),
    so tests can assert exact values and the stage composes downstream.
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    schema = (
        "doc_id bigint, modality string, width int, height int, "
        "n_bytes int, checksum string"
    )

    def run(batches):
        import hashlib

        for pdf in batches:
            out = pdf[["doc_id", "modality"]].copy()
            out["width"] = width
            out["height"] = height
            out["n_bytes"] = width * height * 3
            out["checksum"] = [
                hashlib.sha256(
                    bytes(p) + f":{width}x{height}".encode()
                ).hexdigest()
                for p in pdf["payload"]
            ]
            yield out

    return df.mapInPandas(run, schema=schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """Video frame sampling — the UDTF shape (1 row in → many rows out)
    through mapInPandas.

    A real implementation seeks keyframes with ffmpeg; the stub emits one
    deterministic "frame" per ``every_n_bytes`` of payload (offset +
    sha256 of the slice), which exercises the part Spark cares about: the
    fan-out row count, the declared schema, and batch-wise memory (one
    input batch may expand to many output rows — mapInPandas streams the
    expansion instead of materializing it)."""
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    schema = "doc_id bigint, frame_idx int, byte_offset int, frame_checksum string"

    def run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p)
                for idx, off in enumerate(range(0, len(raw), every_n_bytes)):
                    rows.append(
                        (
                            doc_id,
                            idx,
                            off,
                            hashlib.sha256(
                                raw[off : off + every_n_bytes]
                            ).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "byte_offset", "frame_checksum"],
            )

    return df.mapInPandas(run, schema=schema)
