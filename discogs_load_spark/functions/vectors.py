"""Dual-dialect vector expression builders: deterministic cosine similarity
and hyperplane-LSH bucketing for embedding columns (array<float>).

Determinism strategy: the dot product is UNROLLED into a fixed left-
associated expression tree ``a1*b1 + a2*b2 + …`` over doubles. IEEE-754
ops on identical inputs with identical association are bitwise deterministic
in any engine — so Spark and DuckDB produce the same double, with no decimal
detour in the hot path and everything whole-stage-codegen'd JVM-side.

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


def dot_sql(a: str, b: str, dim: int, dialect: str) -> str:
    """Unrolled dot product of two double arrays (left-associated chain)."""
    terms = [
        f"CAST({_elem(a, i, dialect)} AS DOUBLE) * CAST({_elem(b, i, dialect)} AS DOUBLE)"
        for i in range(1, dim + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def norm2_sql(a: str, dim: int, dialect: str) -> str:
    """Unrolled squared L2 norm."""
    terms = [
        f"CAST({_elem(a, i, dialect)} AS DOUBLE) * CAST({_elem(a, i, dialect)} AS DOUBLE)"
        for i in range(1, dim + 1)
    ]
    return "(" + " + ".join(terms) + ")"


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
    double → identical signs in both engines.
    """
    bits = []
    for coeffs in hyperplanes(n_planes, dim):
        terms = [
            f"CAST({_elem(vec, i + 1, dialect)} AS DOUBLE) * {c}.0"
            for i, c in enumerate(coeffs)
            if c != 0
        ]
        s = " + ".join(terms) if terms else "0.0"
        bits.append(f"(CASE WHEN ({s}) >= 0 THEN '1' ELSE '0' END)")
    if dialect == "duckdb":
        return "(" + " || ".join(bits) + ")"
    return f"concat({', '.join(bits)})"
