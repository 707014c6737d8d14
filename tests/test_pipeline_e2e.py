"""End-to-end pipeline test: the composed ``load_dumps`` path the CLI
drives (reference main.rs:42-107 dual) — sniff kind → parse → shred →
parquet sink → read back and query. The individual stages have their own
tests (test_shred_xml); this one pins the COMPOSITION: kind dispatch over
a mixed file set, multi-shard union of one kind, gzip + plain inputs in
the same batch, and the parquet round trip preserving schemas and rows."""

from __future__ import annotations

import gzip
import shutil
from pathlib import Path

from discogs_load_spark.pipeline import load_dumps

FIXTURES = Path(__file__).resolve().parent / "fixtures"


def test_load_dumps_mixed_kinds_sharded_gzip(spark, tmp_path):
    # mixed batch: all four kinds at once, releases as TWO shards (one
    # gzipped) — the unsplittable-gzip scale path is "many files"
    rel_gz = tmp_path / "releases-shard2.xml.gz"
    with open(FIXTURES / "releases.xml", "rb") as f_in, gzip.open(
        rel_gz, "wb"
    ) as f_out:
        shutil.copyfileobj(f_in, f_out)
    files = [
        str(FIXTURES / "releases.xml"),
        str(rel_gz),
        str(FIXTURES / "artists.xml"),
        str(FIXTURES / "labels.xml"),
        str(FIXTURES / "masters.xml"),
    ]
    out = tmp_path / "lake"
    tables = load_dumps(spark, files, parquet_dir=str(out))

    # every dump kind produced its tables
    for expected in (
        "release",
        "release_label",
        "release_video",
        "artist",
        "label",
        "master",
        "master_artist",
    ):
        assert expected in tables, f"missing table {expected}"

    # two identical release shards union: GLOBAL first-wins dedup (the
    # engine's declared deviation from the reference's batch-scoped
    # HashMap, quirk Q7/q33) collapses them — parents AND their children
    # (a losing duplicate's labels must not leak into release_label)
    single = load_dumps(spark, [str(FIXTURES / "releases.xml")])
    assert tables["release"].count() == single["release"].count()
    assert tables["release_label"].count() == single["release_label"].count()
    assert tables["release_video"].count() == single["release_video"].count()

    # parquet round trip: row count and (name, type) schema survive the
    # sink (nullability flattens to nullable on read — Spark's standard
    # parquet behavior, not a data change)
    for name in ("release", "master", "artist", "label"):
        written = spark.read.parquet(str(out / name))
        assert written.count() == tables[name].count()
        assert [(f.name, f.dataType) for f in written.schema.fields] == [
            (f.name, f.dataType) for f in tables[name].schema.fields
        ]

    # the landed lake answers a query joining two shredded tables
    rl = spark.read.parquet(str(out / "release_label"))
    rel = spark.read.parquet(str(out / "release"))
    joined = rel.join(rl, rel.id == rl.release_id)
    assert joined.count() > 0
