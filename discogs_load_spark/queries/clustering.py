"""Clustering query surface: spherical k-means over the ``embeddings``
fixture — the centroid-learning pass that upgrades the fixed-seed IVF index
(queries/similarity.q57) into a data-adaptive one.

The iterative algorithm is unrolled to a fixed iteration count, so the
whole computation is ONE declarative plan (broadcast-join assignment +
decimal-exact centroid means, operators/clustering.py) and has an exact
DuckDB dual — an iterative ML loop under the same value-hash gate as the
relational queries, not a weaker rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.clustering import kmeans, kmeans_oracle_sql
from ..session import load_tables
from .registry import register

DIM = 64
K = 4
ITERATIONS = 3


@register(
    "q99_kmeans_clusters",
    oracle=kmeans_oracle_sql("embeddings", "vec_id", "embedding", DIM, K, ITERATIONS),
    tags=("clustering", "embedding", "iterative"),
)
def q99_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 unrolled Lloyd iterations of spherical k-means (k=4, lowest-id
    seeds): per-vector (cluster, cosine-to-centroid) after the final
    assignment. Assignment is a broadcast crossJoin + HOF cosine (map
    side); means are decimal-exact per (cluster, dim) so every iteration
    is bitwise reproducible across engines and partitionings."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return kmeans(emb, "vec_id", "embedding", DIM, K, ITERATIONS)
