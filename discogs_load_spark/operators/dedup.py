"""Document deduplication operators for training-data pipelines.

Five dedup families, each scale-shaped for 100 TB:

- **exact** — hash-groupBy on normalized text: one shuffle on a 32-byte key.
- **MinHash + LSH** — shingle → n min-hashes → b bands → bucket equi-join:
  candidate pairs come from same-bucket joins, never a cross product.
  O(n_docs · n_shingles) map side; the shuffles are on band keys (uniform by
  construction).
- **n-gram Jaccard** — exact verify step over LSH candidates only.
- **SimHash** — 32-bit signature whose Hamming distance approximates cosine
  over shingle sets; near-dup buckets via signature prefix.
- embedding near-dup lives in similarity.py (same LSH machinery over
  hyperplane buckets).

All expressions come from functions/textfns.py so the DuckDB oracle runs the
byte-identical hash math (see that module's docstring for why md5-hex-string
MinHash makes cross-engine determinism trivial).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textfns import (
    SIMHASH_BITS,
    band_key_sql,
    minhash_agg_sql,
    norm_sql,
    shingles_sql,
    simhash_bit_sql,
    simhash_value_sql,
    tokens_sql,
)

DEFAULT_N_HASHES = 12
DEFAULT_BANDS = 4  # 4 bands x 3 rows: catches jaccard >~ 0.6 reliably


def normalized(df: DataFrame, text_col: str, out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.expr(norm_sql(text_col, "spark")))


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct normalized text: (content_hash, keeper_id,
    n_copies). Keeper = min id (deterministic first-wins)."""
    return (
        normalized(df, text_col)
        .withColumn("content_hash", F.md5("norm"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingle_col(df: DataFrame, text_col: str, k: int, out: str) -> DataFrame:
    """Adds a shingle-array column, materializing the normalize→tokenize
    chain once (the regex walk is the dominant per-row cost; inlined copies
    defeat codegen subexpression elimination — see operators/text.py)."""
    return (
        df.withColumn("__norm", F.expr(norm_sql(text_col, "spark")))
        .withColumn("__toks", F.expr(tokens_sql("__norm", "spark")))
        .withColumn(out, F.expr(shingles_sql("__toks", k, "spark")))
        .drop("__norm", "__toks")
    )


def shingled(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) — exploded word k-grams. Docs with < k tokens vanish
    (no shingles → not MinHash-able; handle them with exact dedup)."""
    return _shingle_col(df, text_col, k, "__sh").select(
        F.col(id_col), F.explode("__sh").alias("sh")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = DEFAULT_N_HASHES,
    k: int = 3,
) -> DataFrame:
    """(id, h0..h{n-1}) — one aggregation pass over exploded shingles; the
    n mins ride the same shuffle."""
    aggs = [F.expr(a) for a in minhash_agg_sql("sh", n_hashes)]
    return shingled(df, id_col, text_col, k).groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs agreeing on at least one LSH band.

    Banding: split the signature into ``bands`` groups of r hashes; docs
    sharing ALL r hashes of any band land in the same bucket. The self-join
    is an equi-join on (band_idx, band_key) — shuffle-partitionable, no
    quadratic blowup unless a bucket itself is huge (near-identical spam;
    cap with AQE skew handling or a bucket-size limit upstream).
    """
    r = n_hashes // bands
    band_struct = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(band_key_sql(b, r, "spark")).alias("key"),
            )
            for b in range(bands)
        ]
    )
    buckets = signatures.select(
        F.col(id_col), F.explode(band_struct).alias("bk")
    ).select(id_col, "bk.band", "bk.key")
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keeps pairs >= threshold.

    |A∩B| and |A∪B| are integer set sizes → the division is one double op,
    bitwise identical across engines.
    """
    sets = _shingle_col(df, text_col, k, "__sh").select(
        F.col(id_col), F.array_distinct("__sh").alias("shset")
    )
    out = (
        pairs.join(sets.withColumnRenamed(id_col, "id_a"), "id_a")
        .withColumnRenamed("shset", "set_a")
        .join(sets.withColumnRenamed(id_col, "id_b"), "id_b")
        .withColumnRenamed("shset", "set_b")
        .withColumn("n_inter", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("set_a") + F.size("set_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash_near_dup_pairs(
    signatures: DataFrame,
    id_col: str,
    sig_col: str = "simhash",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """(id_a < id_b, hamming) pairs whose SimHash differs in ≤ max_hamming
    bits, without a cross product.

    Pigeonhole banding: split the 32-bit signature into n_bands byte-sized
    bands; two signatures within max_hamming < n_bands bits MUST agree on
    at least one whole band, so the equi self-join on (band_idx, band_bits)
    finds every true pair. Exact verify = bit_count(xor) — one integer op.
    Same shuffle shape as MinHash-LSH: scales on band-key partitioning.
    """
    assert max_hamming < n_bands, "pigeonhole needs max_hamming < n_bands"
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(f"(CAST({sig_col} AS BIGINT) >> {b * width}) & {mask}").alias(
                    "key"
                ),
            )
            for b in range(n_bands)
        ]
    )
    buckets = signatures.select(
        F.col(id_col), F.col(sig_col), F.explode(bands).alias("bk")
    ).select(id_col, sig_col, "bk.band", "bk.key")
    a = buckets.select(
        F.col(id_col).alias("id_a"), F.col(sig_col).alias("sig_a"), "band", "key"
    )
    b = buckets.select(
        F.col(id_col).alias("id_b"), F.col(sig_col).alias("sig_b"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, simhash) — 32-bit SimHash over word k-grams.

    Majority vote per bit over md5-nibble bits of each shingle; one shuffle
    (the groupBy), 32 integer sums riding it.
    """
    sh = shingled(df, id_col, text_col, k).withColumn("shmd5", F.md5("sh"))
    sums = [
        F.sum(F.expr(simhash_bit_sql("shmd5", j, "spark"))).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    return (
        sh.groupBy(id_col)
        .agg(*sums)
        .select(
            F.col(id_col),
            F.expr(simhash_value_sql("s")).cast("bigint").alias("simhash"),
        )
    )
