"""Dual-dialect vector expression builders: deterministic cosine similarity
and hyperplane-LSH bucketing for embedding columns (array<float>).

Determinism strategy: both dialects compute a LEFT-ASSOCIATED double fold
``((a1*b1 + a2*b2) + …)``. IEEE-754 ops on identical inputs with identical
association are bitwise deterministic in any engine — so Spark and DuckDB
produce the same double, with no decimal detour in the hot path.

Dialect split: Spark gets ``aggregate(zip_with(a, b, (x,y) -> x*y), 0d,
(acc,x) -> acc+x)`` — the higher-order form codegens as a compact loop
(an unrolled 64-dim cosine inside a join condition would blow a single
codegen method past Janino's 64 KB limit and silently drop the stage to
interpreted mode). DuckDB gets ``list_sum(list_transform(
generate_series(1, dim), i -> CAST(a[i] AS DOUBLE) * CAST(b[i] AS
DOUBLE)))`` — its per-row SUM accumulates the list sequentially from a
zero state, i.e. the same left fold ((0+t1)+t2)+… (verified bitwise over
250k+ real pairs incl. a truncated-dim norm; kahan_sum differs on 58% of
them, so the check discriminates). The earlier unrolled-literal DuckDB
form was bitwise identical too but ~10 KB of text PER USE — an oracle
composing a few cosines (k-means CTEs, the q129 recall panel) reached
~150 KB of SQL whose planning alone OOM'ed a memory-squeezed DuckDB.

CONSTRAINT: the DuckDB fold references ``a``/``b`` inside a lambda body,
and DuckDB re-evaluates non-trivial expressions referenced from lambdas
PER ELEMENT (see functions/textfns.shingles_sql) — so callers must pass
plain column references (all current call sites do; asserted here).

x+0.0 == x for every x (the -0.0 corner changes only the sign of zero,
which compares and hashes equal), so the 0-init and no-init folds agree.

float32 → float64 widening is exact, so casting the parquet float arrays to
double first costs nothing in precision.

Hyperplane coefficients are small integers derived from md5 in PYTHON at
plan-build time and inlined as literals into both dialects — the classic
random-hyperplane LSH (Charikar 2002), reproducible everywhere.
"""

from __future__ import annotations

import hashlib


def _fold_sum(mapped: str) -> str:
    """Spark left fold of a double array: ((0+t1)+t2)+… ."""
    return f"aggregate({mapped}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"


def _assert_column_ref(arr: str) -> None:
    """DuckDB lambda bodies re-evaluate referenced expressions per element;
    the fold forms below are only cheap for plain (qualified) column refs."""
    if not arr.replace(".", "").replace("_", "").isalnum():
        raise ValueError(
            f"duckdb vector fold needs a plain column reference, got: {arr!r}"
        )


def dot_sql(a: str, b: str, dim: int, dialect: str) -> str:
    """Dot product of two float arrays as a left-associated double fold."""
    if dialect == "duckdb":
        _assert_column_ref(a)
        _assert_column_ref(b)
        return (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        )
    return _fold_sum(
        f"zip_with(CAST({a} AS ARRAY<DOUBLE>), CAST({b} AS ARRAY<DOUBLE>),"
        f" (x, y) -> x * y)"
    )


def norm2_sql(a: str, dim: int, dialect: str) -> str:
    """Squared L2 norm, same association as :func:`dot_sql`."""
    if dialect == "duckdb":
        _assert_column_ref(a)
        return (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))"
        )
    return _fold_sum(
        f"zip_with(CAST({a} AS ARRAY<DOUBLE>), CAST({a} AS ARRAY<DOUBLE>),"
        f" (x, y) -> x * y)"
    )


def cosine_sql(a: str, b: str, dim: int, dialect: str) -> str:
    """cos(a,b); callers with precomputed norms should divide dot_sql by
    them instead of inlining this (keeps the pair join cheap)."""
    return (
        f"({dot_sql(a, b, dim, dialect)} / "
        f"(sqrt({norm2_sql(a, dim, dialect)}) * sqrt({norm2_sql(b, dim, dialect)})))"
    )


def hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes: integer coefficients in
    [-8, 7] from md5(plane:dim) — seedable, engine-independent."""
    planes = []
    for p in range(n_planes):
        coeffs = []
        for i in range(dim):
            h = hashlib.md5(f"{p}:{i}".encode()).hexdigest()
            coeffs.append(int(h[:2], 16) % 16 - 8)
        planes.append(coeffs)
    return planes


def lsh_bucket_sql(vec: str, n_planes: int, dim: int, dialect: str) -> str:
    """Sign-bit bucket string: one char per hyperplane ('1' if v·h >= 0).

    Cosine-similar vectors land in the same bucket with high probability;
    the bucket key equi-joins candidates so the exact rerank never sees a
    full cross product. Integer coefficients keep every product exact in
    double → identical signs in both engines. (Adding an exact ±0.0 term
    never changes a partial sum except the sign of zero, and -0.0 >= 0 is
    true — so zero-coefficient terms and fold-order-of-zeros differences
    between dialects cannot flip the emitted bit.)

    DuckDB folds over ``list_zip(vec, [coeffs])`` — both arguments are
    evaluated ONCE (lambda bodies re-evaluate referenced expressions per
    element, and a 64-literal list in the lambda measured 40× slower than
    this; the zip form is 4× faster than the old unrolled literal text
    and ~20× smaller).
    """
    if dialect == "duckdb":
        _assert_column_ref(vec)
    bits = []
    for coeffs in hyperplanes(n_planes, dim):
        if dialect == "duckdb":
            lit = "[" + ", ".join(f"{c}.0" for c in coeffs) + "]"
            s = (
                f"list_sum(list_transform(list_zip(CAST({vec} AS DOUBLE[]), "
                f"{lit}), p -> p[1] * p[2]))"
            )
        else:
            lit = ", ".join(f"CAST({c} AS DOUBLE)" for c in coeffs)
            s = _fold_sum(
                f"zip_with(CAST({vec} AS ARRAY<DOUBLE>), array({lit}),"
                f" (x, c) -> x * c)"
            )
        bits.append(f"(CASE WHEN ({s}) >= 0 THEN '1' ELSE '0' END)")
    if dialect == "duckdb":
        return "(" + " || ".join(bits) + ")"
    return f"concat({', '.join(bits)})"


ADAPTIVE_LSH_MAX_PLANES = 16
ADAPTIVE_LSH_TARGET = 16  # max expected bucket population per band edge


def centroid_planes_sql(k_col: str = "k_rows") -> str:
    """Hyperplane count for bucketing a CENTROID table of k rows — the
    small-side sibling of :func:`adaptive_planes_sql`, which starts at
    p=8 because it targets corpus-sized sides (over a k≈8 centroid table
    p=8 means 256 buckets for 8 rows: almost every probe bucket empty).
    This ladder targets ~{ADAPTIVE_LSH_TARGET}/4 = 4 expected centroids
    per bucket at each rung's upper edge, so a probing vector scores
    O(1) candidates while its bucket is empty with probability
    ~e^-(k/2^p) (the single-band recall term the consuming operator must
    surface, e.g. as an explicit unassigned count). Same nested
    prefix-of-signs family, same pure-integer CASE (cross-engine hash
    gate), thresholds 4·2^p."""
    return (
        f"(CASE WHEN {k_col} <= 16 THEN 2"
        f" WHEN {k_col} <= 64 THEN 4"
        f" WHEN {k_col} <= 256 THEN 6"
        f" WHEN {k_col} <= 1024 THEN 8"
        f" WHEN {k_col} <= 4096 THEN 10 ELSE 12 END)"
    )


def centroid_planes_value(k: int) -> int:
    """Python twin of :func:`centroid_planes_sql` for callers that hold
    the centroid count as a driver-side scalar (the streaming composed
    maintainer computes the prefix length once, outside micro-batches).
    Equality with the SQL ladder at every threshold edge is test-pinned
    (tests/test_adaptive_ops.py) — a drift here would silently bucket
    the two dialects differently."""
    for cap, p in ((16, 2), (64, 4), (256, 6), (1024, 8), (4096, 10)):
        if k <= cap:
            return p
    return 12


def adaptive_planes_sql(n_col: str = "n_rows") -> str:
    """Hyperplane count as a CASE ladder over the corpus row count: the
    smallest even p (in this ladder) with n / 2^p <= 16 at each band's
    upper edge, so expected bucket population — and with it the
    candidate count N·(N/2^p) — stays bounded per row as the corpus
    grows. Pure integer comparisons (log2 is transcendental and banned
    by the cross-engine hash gate); identical text in both dialects.
    Thresholds are 16·2^p for p = 8, 10, 12, 14.

    The population target (16) is sized for THIS engine's per-candidate
    cost — cosine via interpreted higher-order-function folds, measured
    ~1e5 pairs/core/s — so the candidate term stays comparable to the
    per-row sign computation. An engine with codegen'd dot products
    would raise the target (the first ladder revision used 1024 and the
    fixture tiers never left p=8 — the MECHANISM is the ladder, the
    target is a cost-model constant)."""
    return (
        f"(CASE WHEN {n_col} <= 4096 THEN 8"
        f" WHEN {n_col} <= 16384 THEN 10"
        f" WHEN {n_col} <= 65536 THEN 12"
        f" WHEN {n_col} <= 262144 THEN 14 ELSE 16 END)"
    )
