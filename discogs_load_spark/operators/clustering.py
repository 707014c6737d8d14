"""Spherical k-means (Lloyd iterations) over an embedding column — the
centroid-learning step an IVF index needs (operators/similarity.ivf_topk
takes fixed centroid ids today; this learns data-adaptive ones).

Distributed shape, per iteration:

- **assign** — crossJoin with the *broadcast* k-row centroid table and a
  per-row HOF cosine (functions/vectors.cosine_sql): k·N map-side rows,
  no shuffle, no dimension explode. The argmax is a ``max(struct(cos,
  cluster))`` groupBy on the vector id — one combiner-enabled shuffle of
  k·N skinny rows.
- **recompute** — ``posexplode`` the assigned vectors to (cluster, dim,
  val) and take exact decimal sums per (cluster, dim): the per-dimension
  mean must be order-insensitive (functions/numeric.py) or two runs of
  the same job — let alone two engines — would produce different
  centroids and the iteration would diverge from its oracle. The
  (cluster, dim) grain has k·dim groups, so the shuffle reduces to
  almost nothing after map-side partial aggregation.
- centroid arrays are rebuilt with ``sort_array(collect_list(struct(dim,
  mean)))`` — k rows, bounded size.

Iterations are unrolled by the caller (fixed count), which keeps the whole
computation a single declarative plan AND makes it expressible as plain
SQL for the DuckDB referee — an iterative ML algorithm under the same
value-hash gate as the relational queries.

Determinism: assignment ties broken by (cos, cluster) struct max; cosine
is the left-associated fold shared with the ANN operators; means are
decimal-exact. Empty clusters drop out of the centroid table (inner
groupBy) identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.numeric import dec_sum
from ..functions.vectors import cosine_sql


def _as_double(vec: str) -> str:
    return f"CAST({vec} AS ARRAY<DOUBLE>)"


def seed_centroids(emb: DataFrame, id_col: str, vec_col: str, k: int) -> DataFrame:
    """Deterministic seeds: the k lowest-id vectors (k-means++ would add a
    data pass per seed; for the fixture referee a fixed seed is the point)."""
    return emb.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("bigint").alias("cluster"),
        F.expr(_as_double(vec_col)).alias("centroid"),
    )


def assign_clusters(
    emb: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    """(id, cluster, cos) — nearest centroid by cosine, broadcast join.

    The argmax groupBy keys on the id ALONE: grouping on (id, vec) would
    shuffle k copies of every embedding through the exchange; this plan
    shuffles k·N skinny (id, cluster, cos) rows and lets the recompute
    step join the winning assignment back to the vector table instead.
    """
    cos = cosine_sql(_as_double(vec_col), "centroid", dim, "spark")
    scored = (
        emb.select(id_col, vec_col)
        .crossJoin(F.broadcast(centroids))
        .select(id_col, F.expr(cos).alias("cos"), "cluster")
    )
    return (
        scored.groupBy(id_col)
        .agg(F.max(F.struct("cos", "cluster")).alias("best"))
        .select(
            id_col,
            F.col("best.cluster").alias("cluster"),
            F.col("best.cos").alias("cos"),
        )
    )


def recompute_centroids(
    assigned: DataFrame,
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    scale: int = 9,
) -> DataFrame:
    """(cluster, centroid) — exact per-dimension decimal means."""
    longf = assigned.select(id_col, "cluster").join(
        emb.select(id_col, vec_col), id_col
    ).select(
        "cluster", F.posexplode(F.expr(_as_double(vec_col))).alias("dim", "val")
    )
    means = longf.groupBy("cluster", "dim").agg(
        (dec_sum("val", "s", scale=scale) / F.count("val")).alias("mean")
    )
    return means.groupBy("cluster").agg(
        # bounded: one struct per embedding dimension (fixed vector dim)
        F.expr("transform(sort_array(collect_list(struct(dim, mean))), x -> x.mean)")
        .alias("centroid")
    )


def kmeans(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    iterations: int,
) -> DataFrame:
    """(id, cluster, cos) after ``iterations`` unrolled Lloyd steps."""
    centroids = seed_centroids(emb, id_col, vec_col, k)
    assigned = assign_clusters(emb, centroids, id_col, vec_col, dim)
    for _ in range(iterations - 1):
        centroids = recompute_centroids(assigned, emb, id_col, vec_col)
        assigned = assign_clusters(emb, centroids, id_col, vec_col, dim)
    return assigned.select(id_col, "cluster", "cos")


def kmeans_centroids(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    iterations: int,
) -> DataFrame:
    """(cluster, centroid) after ``iterations`` Lloyd steps — the learned
    centroid table an IVF index builds on (operators/similarity.
    ivf_topk_with_centroids)."""
    centroids = seed_centroids(emb, id_col, vec_col, k)
    if iterations <= 1:
        return centroids
    assigned = assign_clusters(emb, centroids, id_col, vec_col, dim)
    for _ in range(iterations - 2):
        centroids = recompute_centroids(assigned, emb, id_col, vec_col)
        assigned = assign_clusters(emb, centroids, id_col, vec_col, dim)
    return recompute_centroids(assigned, emb, id_col, vec_col)


def kmeans_oracle_ctes(
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int | str,  # literal, or a SQL scalar expr (e.g. data-sized k)
    iterations: int,
    scale: int = 9,
    prefix: str = "",
) -> tuple[list[str], str, str]:
    """The unrolled-iteration CTE list plus the names of the final
    assignment and final centroid CTEs — composable by downstream oracles
    (learned-IVF probes) as well as :func:`kmeans_oracle_sql`.

    Note the seed CTE exposes a ``centroid`` column too, so the final
    centroid CTE has a uniform shape at any iteration count.

    ``prefix`` namespaces the generated CTE names (c0 -> {prefix}c0 ...)
    so an oracle can compose TWO independent Lloyd chains (q228's
    centroid refresh trains old-on-base and new-on-full side by side);
    the default "" keeps every existing oracle's SQL byte-identical.
    """
    cos0 = cosine_sql(f"e.{vec_col}", f"c.{vec_col}", dim, "duckdb")
    cosn = cosine_sql(f"e.{vec_col}", "c.centroid", dim, "duckdb")
    parts = [
        f"{prefix}c0 AS (SELECT {id_col} AS cluster, {vec_col}, "
        f"{vec_col} AS centroid FROM {table} WHERE {id_col} < {k})",
        f"""{prefix}a0 AS (
        SELECT {id_col}, cluster, cos FROM (
            SELECT e.{id_col}, c.cluster, {cos0} AS cos,
                   row_number() OVER (PARTITION BY e.{id_col}
                                      ORDER BY {cos0} DESC, c.cluster DESC) AS rn
            FROM {table} e CROSS JOIN {prefix}c0 c
        ) WHERE rn = 1
    )""",
    ]
    for it in range(1, iterations):
        prev = f"{prefix}a{it - 1}"
        parts.append(
            f"""{prefix}m{it} AS (
        SELECT a.cluster, t.i AS dim,
               CAST(SUM(CAST(CAST(e.{vec_col}[t.i + 1] AS DOUBLE) AS DECIMAL(25,{scale}))) AS DOUBLE)
                 / COUNT(*) AS mean
        FROM {prev} a JOIN {table} e USING ({id_col}),
             unnest(range({dim})) t(i)
        GROUP BY a.cluster, t.i
    )"""
        )
        parts.append(
            f"{prefix}c{it} AS (SELECT cluster, list(mean ORDER BY dim) AS centroid "
            f"FROM {prefix}m{it} GROUP BY cluster)"
        )
        parts.append(
            f"""{prefix}a{it} AS (
        SELECT {id_col}, cluster, cos FROM (
            SELECT e.{id_col}, c.cluster, {cosn} AS cos,
                   row_number() OVER (PARTITION BY e.{id_col}
                                      ORDER BY {cosn} DESC, c.cluster DESC) AS rn
            FROM {table} e CROSS JOIN {prefix}c{it} c
        ) WHERE rn = 1
    )"""
        )
    return parts, f"{prefix}a{iterations - 1}", f"{prefix}c{iterations - 1}"


def kmeans_oracle_sql(
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    iterations: int,
    scale: int = 9,
) -> str:
    """DuckDB dual of :func:`kmeans`: the same unrolled iterations as
    chained CTEs (:func:`kmeans_oracle_ctes`).

    The long-format (cluster, dim, val) mean uses the identical decimal
    recipe; assignment rebuilds centroid lists with ``list(mean ORDER BY
    dim)`` and evaluates the same left-associated cosine text.

    Gotcha encoded in the CTE builder: the element must be widened
    FLOAT→DOUBLE before the DECIMAL cast. Spark's side always sums the
    widened double (``CAST(vec AS ARRAY<DOUBLE>)``); DuckDB's direct
    FLOAT→DECIMAL cast rounds differently in the last decimal digit
    (~1e-9 per element), which compounds across a mean and flips
    later-iteration assignments.
    """
    parts, last_a, _ = kmeans_oracle_ctes(
        table, id_col, vec_col, dim, k, iterations, scale
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT {id_col}, cluster, cos FROM {last_a}"
    )


def kmeans_two_level(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k1: int,
    k2: int,
    iterations: int,
) -> DataFrame:
    """(id, cluster) via HIERARCHICAL assignment: k1 coarse Lloyd cells
    over the full corpus, then k2 sub-cells learned independently INSIDE
    each coarse cell (seeded by the cell's k2 lowest-id members, same
    Lloyd/decimal machinery at the (coarse, sub) grain).

    Why this exists: flat k-means assignment is n*k cosine rows through
    the argmax exchange. SemDeDup-style blocking needs k ~ n/cell to keep
    in-cluster pair work linear, which makes FLAT assignment n^2/cell —
    measured 27x wall at a 10x scale-up (sf1 -> sf10 tier) even after the
    pair stage was fixed. Two-level assignment is n*(k1 + k2*iters) rows:
    with k1 = k2 = sqrt(n/cell) that's ~2n*sqrt(k) — the standard
    IVF-style answer, and every join here is a broadcast (level 1) or a
    coarse-cell equi-join (level 2), never corpus x centroids.

    Engine-only path (activated above the fixture scales): the driver's
    DuckDB oracle checks the FLAT path, whose clustering this does not
    reproduce; callers switch on corpus size (queries/similarity.py) so
    every oracle-checked scale still runs flat.
    """
    from pyspark.sql import Window as W

    coarse = kmeans(emb, id_col, vec_col, dim, k1, iterations).select(
        id_col, F.col("cluster").alias("c1")
    )
    from pyspark.storagelevel import StorageLevel

    base = coarse.join(emb.select(id_col, vec_col), id_col).select(
        id_col, "c1", F.expr(_as_double(vec_col)).alias("vec")
    )
    # every level-2 round joins base twice (assignment + means); without
    # the persist each branch re-runs the level-1 Lloyd lineage
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    # seeds: each coarse cell's k2 lowest-id members
    rn = F.row_number().over(W.partitionBy("c1").orderBy(id_col))
    centroids = (
        base.withColumn("rn", rn)
        .filter(F.col("rn") <= k2)
        .select("c1", (F.col("rn") - 1).alias("c2"), F.col("vec").alias("centroid"))
    )
    cos = cosine_sql("vec", "centroid", dim, "spark")

    def assign(cents: DataFrame) -> DataFrame:
        scored = base.join(cents, "c1").select(
            id_col, "c1", F.expr(cos).alias("cos"), "c2"
        )
        return (
            scored.groupBy(id_col, "c1")
            .agg(F.max(F.struct("cos", "c2")).alias("best"))
            .select(id_col, "c1", F.col("best.c2").alias("c2"))
        )

    assigned = assign(centroids)
    for _ in range(iterations - 1):
        longf = assigned.join(base, [id_col, "c1"]).select(
            "c1", "c2", F.posexplode("vec").alias("dim", "val")
        )
        means = longf.groupBy("c1", "c2", "dim").agg(
            (dec_sum("val", "s") / F.count("val")).alias("mean")
        )
        cents = means.groupBy("c1", "c2").agg(
            # bounded: one struct per embedding dimension (fixed vector dim)
            F.expr(
                "transform(sort_array(collect_list(struct(dim, mean))), x -> x.mean)"
            ).alias("centroid")
        )
        assigned = assign(cents)
    out = assigned.select(
        id_col,
        (F.col("c1") * F.lit(k2) + F.col("c2")).cast("bigint").alias("cluster"),
    )
    # materialize the (id, cluster) result — two narrow columns — so the
    # corpus-sized base cache can be released NOW instead of pinning a
    # full (id, c1, vec) copy in the storage pool for the session's life
    # (this path only runs above SEM_TWO_LEVEL_MIN, where that copy is
    # the biggest resident frame). persist+count, NOT localCheckpoint: a
    # checkpoint's truncated lineage is unrecoverable when an executor is
    # lost on a real cluster, while a persisted frame recomputes from the
    # (now-uncached, but intact) lineage
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()  # bounded: (id, cluster) pairs only
    base.unpersist()
    return out
