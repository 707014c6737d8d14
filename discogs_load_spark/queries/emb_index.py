"""Materialized embedding cluster-assignment index — the embedding-side
sibling of the document signature index (queries/sig_index.py).

SemDeDup blocking (q154) and the curation pipeline (q169) both start by
k-means-clustering the embedding space (similarity.sem_assignments: flat
or two-level Lloyd, 2 unrolled rounds with broadcast centroids and
decimal-exact means), then do all real work inside cluster-keyed joins.
The assignment is a DETERMINISTIC pure function of the embeddings table
(seed centroids are fixed by vec_id order, means are exact decimals), so
at production scale it is an ingest artifact — SemDeDup's own recipe
clusters once and reuses the partition for every downstream screen —
not a per-query computation. This module materializes (vec_id, cluster)
once per embeddings fingerprint (path, size, mtime + a version string
folding in the k-ladder and iteration count), with
``SPARK_GRAFT_EMB_INDEX=0`` as the in-plan referee switch, equality
test-pinned (tests/test_sig_index.py).

q99 (the registered k-means query) intentionally KEEPS computing its
assignments in-plan: it is the live Lloyd computation the oracle checks
round-for-round; this index is for the queries that CONSUME a finished
partition.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

EMB_INDEX_DIR = os.environ.get(
    "SPARK_GRAFT_EMB_INDEX_DIR", "/tmp/spark_graft_emb_index"
)


def _version() -> str:
    # every constant the build lineage branches on belongs here — a
    # changed constant without a version change serves a stale cached
    # index (ADVICE r10: SEM_K and the flat-vs-two-level cutoff were
    # missing)
    from ..functions.vectors import ADAPTIVE_LSH_MAX_PLANES
    from .similarity import SEM_CELL, SEM_ITER, SEM_K, SEM_TWO_LEVEL_MIN

    return (
        f"v2:semk{SEM_K}-semcell{SEM_CELL}-iter{SEM_ITER}"
        f"-2lvl{SEM_TWO_LEVEL_MIN}-bits{ADAPTIVE_LSH_MAX_PLANES}-nrm"
    )


def _index_fingerprint(sf_dir: str) -> str:
    src = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    st = os.stat(src)
    return f"{_version()}|{src}|{st.st_size}|{int(st.st_mtime)}"


def _enriched_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The build lineage, in-plan: the embeddings table enriched with
    every per-vector derived column the similarity family consumes —
    the k-means cluster (SemDeDup blocking), the 16-hyperplane sign-bit
    string (every LSH consumer's bucket is a PREFIX of it: the plane
    family is nested by construction, functions/vectors.hyperplanes),
    and the L2 norm (the exact-cosine denominators). At production
    scale this IS the enriched embeddings table a pipeline writes at
    ingest; locally it doubles a small fixture."""
    from pyspark.sql import functions as F

    from ..functions.vectors import (
        ADAPTIVE_LSH_MAX_PLANES,
        lsh_bucket_sql,
        norm2_sql,
    )
    from ..session import load_tables
    from .similarity import DIM, sem_assignments

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    # bounded: 1-row count-star scalar sizes the clustering to the corpus
    assigned = sem_assignments(emb, emb.count())
    bits = lsh_bucket_sql("embedding", ADAPTIVE_LSH_MAX_PLANES, DIM, "spark")
    return (
        emb.join(assigned, "vec_id")
        .select(
            "vec_id",
            "embedding",
            "cluster",
            F.expr(bits).alias("bits"),
            F.expr(f"sqrt({norm2_sql('embedding', DIM, 'spark')})").alias(
                "nrm"
            ),
        )
    )


def emb_enriched(
    spark: SparkSession, sf_dir: str, rebuild: bool = False
) -> DataFrame:
    """(vec_id, embedding, cluster, bits, nrm) — the materialized
    enriched embeddings table; see the module docstring.
    ``SPARK_GRAFT_EMB_INDEX=0`` bypasses and returns the in-plan
    lineage (referee mode)."""
    if os.environ.get("SPARK_GRAFT_EMB_INDEX", "1") == "0":
        return _enriched_frame(spark, sf_dir)
    # one write-once/tmp-rename implementation for every index artifact
    # (r13 review: three hand-copies of the race rule)
    from .sig_index import _materialized

    fp = _index_fingerprint(sf_dir)
    key = hashlib.md5(fp.encode()).hexdigest()[:16]
    dest = os.path.join(EMB_INDEX_DIR, key)
    return _materialized(
        spark, dest, lambda: _enriched_frame(spark, sf_dir), rebuild
    )


def emb_cluster_index(
    spark: SparkSession, sf_dir: str, rebuild: bool = False
) -> DataFrame:
    """(vec_id, cluster) — the SemDeDup blocking view of the enriched
    table (column pruning reaches the parquet scan, so the embedding
    payload is never read)."""
    return emb_enriched(spark, sf_dir, rebuild=rebuild).select(
        "vec_id", "cluster"
    )


# --- frozen delta-training centroids (q220/q221/q222/q225) -----------------
#
# The streaming/incremental assignment family trains the SAME frozen
# centroid table on every invocation: base snapshot = the vec_id-modulo
# complement of the held-out delta (queries/dedup.NEW_MOD/NEW_REM),
# sem_assignments Lloyd rounds, centroids = per-cluster decimal-exact
# means (recompute_centroids). That is a deterministic pure function of
# the embeddings table — an ingest artifact, not per-query work (ADVICE
# r12: q221/q222 re-ran the full Lloyd training per invocation and leaked
# a persisted frame). Materialized per embeddings fingerprint with the
# SAME referee switch as the enriched index (SPARK_GRAFT_EMB_INDEX=0
# recomputes in-plan; equality test-pinned in tests/test_sig_index.py).


def _centroid_version() -> str:
    from .dedup import NEW_MOD, NEW_REM
    from .similarity import SEM_CELL, SEM_ITER, SEM_K, SEM_TWO_LEVEL_MIN

    return (
        f"cent-v1:semk{SEM_K}-semcell{SEM_CELL}-iter{SEM_ITER}"
        f"-2lvl{SEM_TWO_LEVEL_MIN}-mod{NEW_MOD}r{NEW_REM}"
    )


def _centroid_fingerprint(sf_dir: str) -> str:
    src = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    st = os.stat(src)
    return f"{_centroid_version()}|{src}|{st.st_size}|{int(st.st_mtime)}"


def _centroid_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.clustering import recompute_centroids
    from ..session import load_tables
    from .dedup import NEW_MOD, NEW_REM
    from .similarity import sem_assignments

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    base = emb.filter((F.col("vec_id") % NEW_MOD) != NEW_REM)
    # bounded: 1-row count-star scalar sizes the clustering to the corpus
    assigned = sem_assignments(base, base.count())
    return recompute_centroids(assigned, base, "vec_id", "embedding")


def frozen_centroids(
    spark: SparkSession, sf_dir: str, rebuild: bool = False
) -> DataFrame:
    """(cluster, centroid) — the frozen base-snapshot centroid table the
    delta-assignment family scores against; see the block comment."""
    if os.environ.get("SPARK_GRAFT_EMB_INDEX", "1") == "0":
        return _centroid_frame(spark, sf_dir)
    from .sig_index import _materialized

    fp = _centroid_fingerprint(sf_dir)
    key = hashlib.md5(fp.encode()).hexdigest()[:16]
    dest = os.path.join(EMB_INDEX_DIR, f"cent_{key}")
    return _materialized(
        spark, dest, lambda: _centroid_frame(spark, sf_dir), rebuild
    )
