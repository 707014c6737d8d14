"""Sinks: DDL generation, COPY row encoding, parquet round-trip, pipeline."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from discogs_load_spark.pipeline import load_dumps
from discogs_load_spark.schemas import ARTIST_SCHEMA, RELEASE_SCHEMA
from discogs_load_spark.sinks.files import write_parquet
from discogs_load_spark.sinks.postgres import (
    copy_encode_row,
    create_table_ddl,
    index_ddl,
    jdbc_column_types,
)

FIXTURES = Path(__file__).parent / "fixtures"


def test_create_table_ddl_release():
    ddl = create_table_ddl("release")
    assert ddl.startswith("DROP TABLE IF EXISTS release;")
    assert "id integer NOT NULL" in ddl
    assert "genres text[]" in ddl
    assert "released text" in ddl  # date-ish stays TEXT, like the reference


def test_jdbc_column_types_arrays():
    s = jdbc_column_types(ARTIST_SCHEMA)
    assert "urls text[]" in s and "members text[]" in s and "id integer" in s


def test_index_ddl_covers_join_keys():
    stmts = index_ddl()
    assert any("PRIMARY KEY (id)" in s for s in stmts)
    assert any("release_label (label_id)" in s for s in stmts)
    assert len(stmts) == 10


def test_copy_encode_row():
    row = (
        1,
        "Accepted",
        'tab\there "quoted" and\nnewline',
        "US",
        "2000",
        None,
        ["Deep House", 'odd"style\\x'],
        [],
        0,
        "Correct",
    )
    enc = copy_encode_row(row, RELEASE_SCHEMA)
    fields = enc.split("\t")
    assert fields[0] == "1"
    assert fields[2] == 'tab\\there "quoted" and\\nnewline'
    assert fields[5] == "\\N"
    assert fields[6] == '{"Deep House","odd\\\\"style\\\\\\\\x"}'
    assert fields[7] == "{}"


def test_pipeline_parquet_roundtrip(spark, tmp_path):
    """Full ETL: 4 dumps in one call → 7 parquet tables, reloadable with the
    declared schemas."""
    files = [str(FIXTURES / f) for f in
             ["releases.xml", "artists.xml", "labels.xml", "masters.xml"]]
    out = str(tmp_path / "lake")
    tables = load_dumps(spark, files, parquet_dir=out)
    assert set(tables) == {
        "release", "release_label", "release_video",
        "artist", "label", "master", "master_artist",
    }
    back = spark.read.parquet(f"{out}/release")
    assert back.count() == 3
    assert [f.name for f in back.schema.fields] == [
        f.name for f in RELEASE_SCHEMA.fields
    ]
    assert spark.read.parquet(f"{out}/master_artist").count() == 2


def test_write_parquet_partitioned(spark, tmp_path):
    df = spark.range(100).withColumn("bucket", F.col("id") % 4)
    write_parquet(df, str(tmp_path / "p"), partition_by=["bucket"])
    assert spark.read.parquet(str(tmp_path / "p")).count() == 100


def test_copy_array_literal_roundtrip():
    """Encoder parity with the reference's TEXT_ARRAY COPY writes
    (db.rs:66-76): decoding each line with the server's two-layer rules
    (COPY unescape, then array-literal parse) must recover the row exactly,
    including the adversarial characters of both layers."""
    from discogs_load_spark.sinks.postgres import copy_decode_row

    row = (
        7,
        "Accepted",
        "title",
        "US",
        "2000",
        None,
        ["plain", "", 'quo"te', "back\\slash", "com,ma", "bra{ce}", "tab\there", "nl\nhere"],
        [],
        0,
        "Correct",
    )
    enc = copy_encode_row(row, RELEASE_SCHEMA)
    assert "\n" not in enc  # one row = one COPY line, always
    assert copy_decode_row(enc, RELEASE_SCHEMA) == row


def test_copy_roundtrip_fuzz():
    """Property: decode(encode(row)) == row for arbitrary text content."""
    from hypothesis import given, settings, strategies as st

    from discogs_load_spark.sinks.postgres import copy_decode_row

    txt = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.one_of(st.none(), txt),
        st.lists(txt, max_size=5),
    )
    def roundtrip(i, s, a):
        import pyspark.sql.types as T

        schema = T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("s", T.StringType()),
                T.StructField("a", T.ArrayType(T.StringType())),
            ]
        )
        row = (i, s, a)
        assert copy_decode_row(copy_encode_row(row, schema), schema) == row

    roundtrip()
