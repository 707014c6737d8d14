"""Operator-level checks for the bucketized range join, SimHash banding,
and IVF probe: each approximate/re-keyed implementation is compared against
the naive exact form on the small fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from discogs_load_spark.operators.dedup import simhash, simhash_near_dup_pairs
from discogs_load_spark.operators.relational import range_join_bucketized
from discogs_load_spark.operators.similarity import cosine_topk, ivf_topk
from discogs_load_spark.session import load_tables

from .conftest import SF_SMALL


def test_range_join_bucketized_equals_theta_join(spark):
    events = load_tables(spark, SF_SMALL, ["events"])["events"]
    left = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("ts").alias("e_ts")
    )
    right = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    bucketized = range_join_bucketized(left, right, "e_ts", "p_ts", 0, 300)
    naive = left.join(
        right,
        (F.col("p_ts") > F.col("e_ts"))
        & (F.col("p_ts") <= F.col("e_ts") + F.expr("INTERVAL '300' SECOND")),
    )
    got = sorted((r.e_id, r.p_id) for r in bucketized.collect())
    want = sorted((r.e_id, r.p_id) for r in naive.collect())
    assert got == want and len(want) > 0


def test_simhash_banding_finds_all_close_pairs(spark):
    docs = load_tables(spark, SF_SMALL, ["documents"])["documents"]
    sigs = simhash(docs, "doc_id", "text").cache()
    banded = simhash_near_dup_pairs(sigs, "doc_id", max_hamming=3, n_bands=4)
    a = sigs.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sig_a")
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b")
    )
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))),
        )
        .filter(F.col("hamming") <= 3)
    )
    got = sorted((r.id_a, r.id_b, r.hamming) for r in banded.collect())
    want = sorted((r.id_a, r.id_b, r.hamming) for r in brute.collect())
    sigs.unpersist()
    # pigeonhole guarantee: banding loses NOTHING at hamming <= n_bands - 1
    assert got == want


def test_ivf_topk_subset_of_exact_ranking(spark):
    emb = load_tables(spark, SF_SMALL, ["embeddings"])["embeddings"]
    queries = emb.filter(F.col("vec_id").isin(0, 1))
    ivf = ivf_topk(
        emb, queries, "vec_id", "embedding", 64, k=5,
        centroid_ids=(3, 57, 111),
    )
    exact = cosine_topk(emb, queries, "vec_id", "embedding", 64, k=200)
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    universe = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert len(got) > 0
    # every IVF hit is a genuine corpus neighbor (cell-restricted subset of
    # the exact ranking's top-200 pool)
    assert got <= universe
