"""Dual-dialect vector expression builders: deterministic cosine similarity
and hyperplane-LSH bucketing for embedding columns (array<float>).

Determinism strategy: both dialects compute a LEFT-ASSOCIATED double fold
``((a1*b1 + a2*b2) + …)``. IEEE-754 ops on identical inputs with identical
association are bitwise deterministic in any engine — so Spark and DuckDB
produce the same double, with no decimal detour in the hot path.

Dialect split: DuckDB gets the sum unrolled as literal SQL text; Spark gets
``aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)`` — the
higher-order form codegens as a compact loop. An unrolled 64-dim cosine
(dot + two norms) inside a join condition blows a single codegen method past
Janino's 64 KB limit and silently drops the whole stage to interpreted mode;
the HOF loop stays inside whole-stage codegen. The two forms are bitwise
equal: the fold is ((0+t1)+t2)+… and x+0.0 == x for every x (the -0.0
corner changes only the sign of zero, which compares and hashes equal).

float32 → float64 widening is exact, so casting the parquet float arrays to
double first costs nothing in precision.

Hyperplane coefficients are small integers derived from md5 in PYTHON at
plan-build time and inlined as literals into both dialects — the classic
random-hyperplane LSH (Charikar 2002), reproducible everywhere.
"""

from __future__ import annotations

import hashlib


def _elem(arr: str, i: int, dialect: str) -> str:
    """1-based element access in both dialects."""
    if dialect == "duckdb":
        return f"{arr}[{i}]"
    return f"element_at({arr}, {i})"


def _fold_sum(mapped: str) -> str:
    """Spark left fold of a double array: ((0+t1)+t2)+… ."""
    return f"aggregate({mapped}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"


def dot_sql(a: str, b: str, dim: int, dialect: str) -> str:
    """Dot product of two float arrays as a left-associated double chain."""
    if dialect == "duckdb":
        terms = [
            f"CAST({_elem(a, i, dialect)} AS DOUBLE) * CAST({_elem(b, i, dialect)} AS DOUBLE)"
            for i in range(1, dim + 1)
        ]
        return "(" + " + ".join(terms) + ")"
    return _fold_sum(
        f"zip_with(CAST({a} AS ARRAY<DOUBLE>), CAST({b} AS ARRAY<DOUBLE>),"
        f" (x, y) -> x * y)"
    )


def norm2_sql(a: str, dim: int, dialect: str) -> str:
    """Squared L2 norm, same association as :func:`dot_sql`."""
    if dialect == "duckdb":
        terms = [
            f"CAST({_elem(a, i, dialect)} AS DOUBLE) * CAST({_elem(a, i, dialect)} AS DOUBLE)"
            for i in range(1, dim + 1)
        ]
        return "(" + " + ".join(terms) + ")"
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
    double → identical signs in both engines. (The Spark fold includes the
    zero-coefficient terms the DuckDB unroll skips; adding an exact ±0.0
    never changes a partial sum except the sign of zero, and -0.0 >= 0 is
    true — the emitted bit is identical.)
    """
    bits = []
    for coeffs in hyperplanes(n_planes, dim):
        if dialect == "duckdb":
            terms = [
                f"CAST({_elem(vec, i + 1, dialect)} AS DOUBLE) * {c}.0"
                for i, c in enumerate(coeffs)
                if c != 0
            ]
            s = " + ".join(terms) if terms else "0.0"
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
