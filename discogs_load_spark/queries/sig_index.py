"""Materialized document signature index — the ingest-time artifact the
whole text-dedup family reads.

Motivation (BENCH_perquery_r10): ~16 registered queries each re-ran the
normalize → tokenize → shingle → 12×md5 chain over the full ``documents``
table per query (q51/q52/q89/q100/q123/q141/q175/q195/q201/q204/q207/
q210/q215 + the simhash pair q53/q64), making the chain the suite's
dominant repeated cost — exactly the shape the CDC suite already fixed
with ``cdc_chunk_index`` (VERDICT r09 item 2). This module is the same
move one level up: ONE pass over the corpus materializes, per document,

- ``content_hash`` — md5 of the normalized text (exact-dedup key, q50),
- ``toks``         — the normalized token array (v2): the tokenized-corpus
                     artifact the text-analysis family reads (BM25
                     postings, n-gram LMs, BPE histograms, CMS grids) —
                     any k-gram derives from it with one cheap array
                     transform (functions/textfns.shingles_sql), no
                     per-query regex re-normalization,
- ``sh``           — the raw word-3-gram shingle array (order and
                     multiplicity preserved: every downstream operator —
                     distinct sets for Jaccard/containment, folds for
                     SimHash/OPH, explode for prefix filtering — derives
                     from it losslessly),
- ``h0..h{n-1}``   — the MinHash signature
                     (operators/dedup.minhash_signatures_from_shingles,
                     byte-identical math to the in-plan path),

fingerprinted by (documents.parquet path, size, mtime) + an index version
string, so a driver fixture regeneration or a semantics change can never
serve a stale index. ``SPARK_GRAFT_SIG_INDEX=0`` bypasses materialization
and every accessor returns the in-plan lineage (the referee mode —
tests/test_sig_index.py pins bitwise equality between the two paths).

100 TB design note: this is the standard production shape — MinHash
pipelines persist signatures at ingest (the signature columns are
~n_hashes×32 B/doc, trivially small) and re-screen every delta against
the index instead of re-hashing the corpus (q100's docstring has always
described this; now it IS this). The ``sh`` column is the honest cost:
storing raw shingle STRINGS is ~k× corpus size. We keep strings here
because the DuckDB oracle's exactness argument stays by-construction
(no hash-collision caveat in the Jaccard/containment verify); at real
scale the documented variant is a 64-bit hash per shingle (xxhash64 —
8 B/shingle, collision probability over a pair's union ~|union|²/2⁶⁴),
or dropping ``sh`` entirely and recomputing verify sets for candidate
docs only via a semi-join against the raw corpus — the verify stage only
ever touches candidate pairs, never the full corpus.

Reference parity note: the reference engine pre-declares its access
paths at ingest (discogs-load sql/indexes.sql:1-16); this index is the
Spark-native analogue for the dedup query family.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.textfns import norm_sql, shingles_sql, tokens_sql
from ..operators.dedup import DEFAULT_N_HASHES
from ..session import load_tables

SIG_INDEX_DIR = os.environ.get(
    "SPARK_GRAFT_SIG_INDEX_DIR", "/tmp/spark_graft_sig_index"
)
# bump when shingle/signature semantics change so a stale cached index
# can never satisfy a new definition
_SIG_INDEX_VERSION = f"v2:k3-md5-n{DEFAULT_N_HASHES}-contenthash-toks"

SHINGLE_K = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def sig_frame(docs: DataFrame) -> DataFrame:
    """The index lineage, in-plan: one row per document (docs with < k
    tokens keep an EMPTY ``sh`` and null h-columns — they are still
    exact-dedup-able via ``content_hash``, matching the long-standing
    operator contract that shingle-less docs fall out of MinHash). The
    normalize→tokenize chain is materialized once per row (the
    _shingle_col discipline: inlined copies defeat codegen
    subexpression elimination)."""
    out = (
        docs.withColumn("__norm", F.expr(norm_sql("text", "spark")))
        .withColumn("content_hash", F.md5("__norm"))
        .withColumn("toks", F.expr(tokens_sql("__norm", "spark")))
        .withColumn("sh", F.expr(shingles_sql("toks", SHINGLE_K, "spark")))
    )
    sig_cols = [
        F.expr(f"array_min(transform(sh, s -> md5('{i}:' || s)))").alias(
            f"h{i}"
        )
        for i in range(DEFAULT_N_HASHES)
    ]
    return out.select(
        "doc_id", "source", "content_hash", "toks", "sh", *sig_cols
    )


def _index_fingerprint(sf_dir: str) -> str:
    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    st = os.stat(src)
    return f"{_SIG_INDEX_VERSION}|{src}|{st.st_size}|{int(st.st_mtime)}"


def doc_signature_index(
    spark: SparkSession, sf_dir: str, rebuild: bool = False
) -> DataFrame:
    """The materialized per-document signature index (see module
    docstring). Cache key = documents.parquet fingerprint + index
    version; ``SPARK_GRAFT_SIG_INDEX=0`` bypasses materialization and
    returns the in-plan lineage (referee mode)."""
    if os.environ.get("SPARK_GRAFT_SIG_INDEX", "1") == "0":
        return sig_frame(_docs(spark, sf_dir))
    fp = _index_fingerprint(sf_dir)
    key = hashlib.md5(fp.encode()).hexdigest()[:16]
    dest = os.path.join(SIG_INDEX_DIR, key)
    if rebuild or not os.path.isdir(dest):
        frame = sig_frame(_docs(spark, sf_dir))
        tmp = f"{dest}.tmp.{os.getpid()}"
        frame.write.mode("overwrite").parquet(tmp)
        try:
            if rebuild and os.path.isdir(dest):
                shutil.rmtree(dest)
            os.rename(tmp, dest)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost a concurrent race
    return spark.read.parquet(dest)


def doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h0..h{n-1}) — drop-in for
    ``minhash_signatures(docs, "doc_id", "text")`` (same empty-shingle
    filter, same hash math, column pruning reaches the index scan so the
    ``sh`` payload is never read)."""
    idx = doc_signature_index(spark, sf_dir)
    return idx.filter(F.size("sh") > 0).select(
        "doc_id", *[f"h{i}" for i in range(DEFAULT_N_HASHES)]
    )


def doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, toks) — the tokenized corpus, for the
    text-analysis family (token explodes, k-gram transforms, per-doc
    length stats). Same values as
    ``F.expr(tokens_sql(norm_sql("text"), ...))`` over ``documents`` by
    shared build expression."""
    return doc_signature_index(spark, sf_dir).select(
        "doc_id", "source", "toks"
    )


def doc_shingle_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh) — the raw shingle arrays, for the *_from_shingles
    operator cores (SimHash, OPH MinHash) and the prefix-filter family."""
    return doc_signature_index(spark, sf_dir).select("doc_id", "sh")


def doc_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shset) — distinct shingle sets, the ``sets`` contract of
    jaccard_verify / containment_verify."""
    return doc_signature_index(spark, sf_dir).select(
        "doc_id", F.array_distinct("sh").alias("shset")
    )


def _prefix_rank_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh, __sz, __rn) — every document's DISTINCT shingles
    ranked rarest-global-document-frequency-first (shingle text as the
    tie-break) with the doc's set size: the PPJoin-family blocking
    artifact both exact set-similarity operators consume
    (operators/dedup.prefix_filter_jaccard_pairs and
    containment_prefix_pairs derive their prefixes by filtering __rn
    against their own thresholds). Ordering depends on corpus-wide
    document frequency, so like the signature columns it is a pure
    function of the corpus — an ingest artifact."""
    from pyspark.sql import Window as W

    sh_pairs = (
        doc_signature_index(spark, sf_dir)
        .select("doc_id", F.explode("sh").alias("sh"))
        .distinct()
    )
    doc_freq = sh_pairs.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
    by_doc = W.partitionBy("doc_id")
    rarest_first = by_doc.orderBy(F.col("__df").asc(), F.col("sh").asc())
    return (
        sh_pairs.join(doc_freq, "sh")
        .withColumn("__sz", F.count(F.lit(1)).over(by_doc))
        .withColumn("__rn", F.row_number().over(rarest_first))
        .select("doc_id", "sh", "__sz", "__rn")
    )


def doc_prefix_rank_index(
    spark: SparkSession, sf_dir: str, rebuild: bool = False
) -> DataFrame:
    """Materialized :func:`_prefix_rank_frame` — cache key = the
    signature index fingerprint + a stage suffix; the same
    ``SPARK_GRAFT_SIG_INDEX=0`` referee switch returns the in-plan
    lineage (which then also derives its shingles in-plan)."""
    if os.environ.get("SPARK_GRAFT_SIG_INDEX", "1") == "0":
        return _prefix_rank_frame(spark, sf_dir)
    fp = _index_fingerprint(sf_dir) + "|prefixrank-v1"
    key = hashlib.md5(fp.encode()).hexdigest()[:16]
    dest = os.path.join(SIG_INDEX_DIR, key)
    if rebuild or not os.path.isdir(dest):
        frame = _prefix_rank_frame(spark, sf_dir)
        tmp = f"{dest}.tmp.{os.getpid()}"
        frame.write.mode("overwrite").parquet(tmp)
        try:
            if rebuild and os.path.isdir(dest):
                shutil.rmtree(dest)
            os.rename(tmp, dest)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost a concurrent race
    return spark.read.parquet(dest)
