"""Binary media-directory source → payload table → mapInPandas feature
stage: the multimodal pipeline's ingestion leg, end to end on real files
(fake media bytes — codecs are stubbed; the source/plumbing is real)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from discogs_load_spark.operators.multimodal import extract_features
from discogs_load_spark.sources.binary_source import read_media_dir


def _write_files(root):
    files = {
        "images/a.jpg": b"\xff\xd8fakejpegbytes" * 10,
        "images/b.png": b"\x89PNGfake" * 5,
        "audio/c.wav": b"RIFFfakewav" * 20,
        "video/d.mp4": b"ftypfakempv" * 3,
        "notes/e.txt": b"plain text payload",
        "blob.bin": b"unknown-extension-bytes",
    }
    for rel, content in files.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(content)
    return files


def test_read_media_dir_modality_and_checksum(spark, tmp_path):
    files = _write_files(tmp_path)
    df = read_media_dir(spark, str(tmp_path))
    rows = {r["uri"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert len(rows) == len(files)
    assert rows["a.jpg"]["modality"] == "image"
    assert rows["c.wav"]["modality"] == "audio"
    assert rows["d.mp4"]["modality"] == "video"
    assert rows["e.txt"]["modality"] == "text"
    assert rows["blob.bin"]["modality"] == "binary"
    for rel, content in files.items():
        r = rows[rel.rsplit("/", 1)[-1]]
        assert r["n_bytes"] == len(content)
        assert r["checksum"] == hashlib.sha256(content).hexdigest()
        assert bytes(r["payload"]) == content


def test_read_media_dir_uri_only_beyond_cap_and_glob(spark, tmp_path):
    _write_files(tmp_path)
    # cap below the biggest file: its payload is dropped, pointer kept
    df = read_media_dir(spark, str(tmp_path), max_bytes=100)
    big = df.filter(F.col("n_bytes") > 100).collect()
    assert big and all(r["payload"] is None for r in big)
    # over-cap files are never read, so they carry no checksum either
    assert all(r["checksum"] is None for r in big)
    # glob pushdown: only the jpgs are listed at all
    jpgs = read_media_dir(spark, str(tmp_path), glob="*.jpg")
    assert [r["modality"] for r in jpgs.collect()] == ["image"]


def test_media_payloads_feed_feature_stage(spark, tmp_path):
    _write_files(tmp_path)
    media = read_media_dir(spark, str(tmp_path)).filter(
        F.col("payload").isNotNull()
    )
    # the mapInPandas stage expects (doc_id, modality, n_bytes, payload)
    staged = media.select(
        F.abs(F.hash("uri")).cast("bigint").alias("doc_id"),
        "modality",
        F.col("n_bytes").cast("int").alias("n_bytes"),
        "payload",
    )
    feats = extract_features(staged)
    got = feats.collect()
    assert len(got) == 6
    assert all(len(r["features"]) == 8 for r in got)
