"""The sf1 bench tier is only a valid measurement if the generated data is
deterministic (same bytes every run/partitioning) and structurally faithful
to the fixtures it scales (vocab, length model, key tiling)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from gen_sf1 import TILES, _gen_documents, _gen_events, _tile  # noqa: E402

from .conftest import SF_SMALL  # noqa: E402


def _value_hash(df):
    cols = sorted(df.columns)
    return df.agg(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


def test_documents_generation_is_deterministic(spark):
    a = _value_hash(_gen_documents(spark, SF_SMALL))
    b = _value_hash(_gen_documents(spark, SF_SMALL).repartition(7))
    assert (a["h"], a["n"]) == (b["h"], b["n"])  # incl. partition-invariance


def test_documents_match_fixture_structure(spark):
    docs = _gen_documents(spark, SF_SMALL)
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    vocab_src = {
        r[0] for r in src.select(F.explode(F.split("text", " "))).distinct().collect()
    }
    vocab_gen = {
        r[0]
        for r in docs.limit(2000)
        .select(F.explode(F.split("text", " ")))
        .distinct()
        .collect()
    }
    assert vocab_gen <= vocab_src  # same closed vocabulary
    stats = docs.agg(
        F.min(F.size(F.split("text", " "))).alias("lo"),
        F.max(F.size(F.split("text", " "))).alias("hi"),
    ).collect()[0]
    assert stats["lo"] >= 10 and stats["hi"] <= 100  # fixture length model
    langs = {r[0] for r in docs.select("lang").distinct().collect()}
    assert langs == {"en", "zh", "es", "fr", "de"}


def test_events_generation_is_deterministic_and_ranged(spark):
    a = _value_hash(_gen_events(spark))
    b = _value_hash(_gen_events(spark))
    assert (a["h"], a["n"]) == (b["h"], b["n"])
    ev = _gen_events(spark)
    row = ev.agg(
        F.min("value").alias("vmin"),
        F.countDistinct("event_type").alias("types"),
    ).collect()[0]
    assert row["vmin"] >= 0.0 and row["types"] == 5


def test_tile_scales_rows_and_shifts_keys(spark):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    n = orders.count()
    span = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    tiled = _tile(orders, {"o_orderkey": span})
    assert tiled.count() == TILES * n
    # keys stay unique across replicas (the point of the shift)
    assert tiled.select("o_orderkey").distinct().count() == TILES * n
    assert tiled.columns == orders.columns
