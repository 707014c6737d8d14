"""Deterministic numeric aggregation helpers.

Problem: ``SUM`` over DOUBLE is order-dependent (floating-point addition is
not associative), so two engines — or two runs of the same engine with a
different partitioning — can produce different last-bits. That breaks
value-hash comparison against the DuckDB oracle AND is a real reproducibility
concern for a 100 TB pipeline (shuffle order varies run to run).

Recipe used by every money/quantity aggregate in the declared query surface:

1. per-row arithmetic stays in DOUBLE — IEEE 754 ops on identical inputs are
   bitwise deterministic in any engine;
2. the per-row result is cast to a fixed-scale DECIMAL (deterministic
   round-half-up at a scale where doubles are never on the boundary);
3. SUM over DECIMAL is exact integer arithmetic — order-insensitive;
4. the aggregate is cast back to DOUBLE for a stable output schema.

The SQL text below is valid in BOTH Spark SQL and DuckDB, so the Spark side
uses ``F.expr(...)`` over the same string the oracle embeds — zero drift.
Overhead is one decimal conversion per row, still whole-stage-codegen'd
JVM-side (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# 25 digits / scale 6 leaves 19 integer digits — enough for sums over 1e12
# rows of 1e6-magnitude values. Raise scale for unit-magnitude data.
PREC = 25
SCALE = 6


def dec_sum_sql(expr: str, alias: str, scale: int = SCALE, prec: int = PREC) -> str:
    """Order-insensitive SUM of a double expression, as SQL text."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({prec},{scale}))) AS DOUBLE) AS {alias}"


def dec_avg_sql(expr: str, alias: str, scale: int = SCALE, prec: int = PREC) -> str:
    """Order-insensitive AVG: exact decimal sum / count, divided in double."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL({prec},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def dec_var_sql(expr: str, alias: str, scale: int = 2) -> str:
    """Order-insensitive sample variance, bitwise-stable across engines.

    The textbook one-pass form ``(sum_sq - sum*sum/n)/(n-1)`` over DOUBLE
    sums is order-dependent, and even over decimal sums the final
    DECIMAL(p, s>0)→DOUBLE cast rounds differently across engines (scale
    division vs exact round-to-nearest — observed one-ulp drift between
    Spark and DuckDB, amplified ~300x by the cancellation). Recipe here:

    1. quantize each value to an integer at ``scale`` (BIGINT, exact);
    2. SUM the values and their squares in DECIMAL(38,0) — exact int128,
       order-insensitive, and the scale-0 → DOUBLE cast is a plain
       integer conversion with one unambiguous round-to-nearest;
    3. finish with the identical sequence of IEEE double ops in both
       engines (same text → same bits).

    Valid in both Spark SQL and DuckDB.
    """
    m = 10 ** scale
    c = f"CAST(ROUND(({expr}) * {m}) AS BIGINT)"
    n = f"COUNT({expr})"
    sc = f"CAST(SUM(CAST({c} AS DECIMAL(38,0))) AS DOUBLE)"
    # one factor widens to DECIMAL(38,0) BEFORE the multiply: a BIGINT
    # product overflows int64 once |value|*10^scale exceeds ~3e9, and
    # Spark (non-ANSI) wraps silently where DuckDB errors — a cross-engine
    # divergence for large-magnitude inputs
    sc2 = f"CAST(SUM(CAST({c} AS DECIMAL(38,0)) * {c}) AS DOUBLE)"
    # n<=1 guard: sample variance is undefined there, and the engines
    # disagree on the raw division (ANSI Spark raises DIVIDE_BY_ZERO,
    # DuckDB's IEEE double division yields inf/NaN) — NULL in both
    return (
        f"(CASE WHEN {n} <= 1 THEN NULL ELSE "
        f"(({n} * {sc2} - {sc} * {sc})"
        f" / ({n} * ({n} - 1))) / {m * m}.0 END) AS {alias}"
    )


def dec_sum(expr: str, alias: str, scale: int = SCALE, prec: int = PREC) -> Column:
    """Spark Column for :func:`dec_sum_sql` (same text → same semantics)."""
    return F.expr(dec_sum_sql(expr, alias, scale, prec).rsplit(" AS ", 1)[0]).alias(alias)


def dec_avg(expr: str, alias: str, scale: int = SCALE, prec: int = PREC) -> Column:
    return F.expr(dec_avg_sql(expr, alias, scale, prec).rsplit(" AS ", 1)[0]).alias(alias)


def epoch_us(col: str | Column) -> Column:
    """Microseconds since epoch for TIMESTAMP *or* TIMESTAMP_NTZ columns.

    ``F.unix_micros`` rejects TIMESTAMP_NTZ (parquet files whose timestamps
    lack isAdjustedToUTC read as NTZ under Spark's NTZ inference). The engine
    pins the session timezone to UTC (session.py), so casting NTZ -> TIMESTAMP
    is value-preserving and this is deterministic for both input types.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def floordiv_sql(a: str, b: int, dialect: str) -> str:
    """Integer division ``a // b`` (positive literal divisor), the SAME
    value in both dialects for negative dividends too.

    Both sides truncate toward zero: Spark's ``div`` by definition, and —
    verified empirically, ``SELECT (-7) // 2`` → ``-3`` — DuckDB's ``//``
    on INTEGER operands as well (its docs describe ``//`` as flooring,
    which holds only for its DOUBLE overload; the integer overload
    truncates). The negative-epoch agreement is pinned by the fuzz test
    (tests/test_dialect_fuzz.py::test_numeric_expressions_agree…), so a
    DuckDB upgrade that changed the semantics would fail loudly instead
    of shifting pre-1970 timestamps one bucket.
    """
    if b <= 0:
        raise ValueError("floordiv_sql needs a positive literal divisor")
    if dialect == "duckdb":
        return f"(({a}) // {b})"
    return f"(({a}) div {b})"


def dec_corr_sql(x: str, y: str, alias: str, scale: int = 2) -> str:
    """Order-insensitive Pearson correlation, bitwise-stable across engines.

    Same quantize-to-integer recipe as :func:`dec_var_sql`: both variables
    quantize to BIGINT at ``scale``, all five sums (Sx, Sy, Sxx, Syy, Sxy)
    are exact DECIMAL(38,0) integer sums, and the closing formula is one
    identical IEEE double sequence (multiplies, subtractions, sqrt — all
    correctly-rounded). The linear quantization scales cancel in Pearson r,
    so no rescale divide appears; the result is exactly corr of the
    quantized variables, identical in any engine. Assumes x and y are
    non-null on the same rows (COUNT is taken over x).

    Cross-engine edge cases pinned down (same text, same result):
    - per-row products widen one factor to DECIMAL(38,0) BEFORE the
      multiply — a BIGINT*BIGINT product overflows int64 past ~3e9
      quantized units, where Spark (non-ANSI) wraps silently and DuckDB
      raises (see dec_var_sql);
    - a zero-variance side makes the denominator 0.0, where Spark's
      non-ANSI Divide returns NULL but DuckDB's IEEE division yields
      ±inf/NaN — the CASE guard makes degenerate groups NULL in both.
    """
    m = 10 ** scale
    cx = f"CAST(ROUND(({x}) * {m}) AS BIGINT)"
    cy = f"CAST(ROUND(({y}) * {m}) AS BIGINT)"
    n = f"COUNT({x})"
    sx = f"CAST(SUM(CAST({cx} AS DECIMAL(38,0))) AS DOUBLE)"
    sy = f"CAST(SUM(CAST({cy} AS DECIMAL(38,0))) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST({cx} AS DECIMAL(38,0)) * {cx}) AS DOUBLE)"
    syy = f"CAST(SUM(CAST({cy} AS DECIMAL(38,0)) * {cy}) AS DOUBLE)"
    sxy = f"CAST(SUM(CAST({cx} AS DECIMAL(38,0)) * {cy}) AS DOUBLE)"
    vx = f"({n} * {sxx} - {sx} * {sx})"
    vy = f"({n} * {syy} - {sy} * {sy})"
    return (
        f"(CASE WHEN {vx} = 0 OR {vy} = 0 THEN NULL ELSE "
        f"({n} * {sxy} - {sx} * {sy}) / (sqrt({vx}) * sqrt({vy})) END)"
        f" AS {alias}"
    )


def dec_ols_sql(x: str, y: str, scale: int = 2) -> dict[str, str]:
    """Order-insensitive simple-OLS terms (y ~ a + b*x), bitwise-stable
    across engines — {'slope': ..., 'intercept': ..., 'r2': ...}.

    Same quantize-to-integer recipe as :func:`dec_corr_sql`: both
    variables quantize to BIGINT at ``scale``, the five sums are exact
    DECIMAL(38,0) integer sums, and each closing formula is one identical
    IEEE double sequence. The quantization factor m cancels in the slope
    (m²/m²) and in r²; the intercept comes out in quantized y units, so
    it closes with a single exact ``/ m`` (m is a power of ten, and the
    whole chain is correctly-rounded IEEE either way). Zero-variance x
    (vertical groups) yields NULL via the same CASE guard both engines
    honor; r² additionally guards zero-variance y.

    Like :func:`dec_corr_sql`, assumes x and y are non-null on the SAME
    rows: n and the x-sums count every non-null-x row while the y- and
    xy-sums skip null-y rows, so a column pair with one-sided nulls
    mixes populations and yields a silently wrong (non-NULL) fit —
    identical in both engines, hence invisible to the cross-engine gate.
    Filter to rows where both are non-null before aggregating."""
    m = 10 ** scale
    cx = f"CAST(ROUND(({x}) * {m}) AS BIGINT)"
    cy = f"CAST(ROUND(({y}) * {m}) AS BIGINT)"
    n = f"COUNT({x})"
    sx = f"CAST(SUM(CAST({cx} AS DECIMAL(38,0))) AS DOUBLE)"
    sy = f"CAST(SUM(CAST({cy} AS DECIMAL(38,0))) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST({cx} AS DECIMAL(38,0)) * {cx}) AS DOUBLE)"
    syy = f"CAST(SUM(CAST({cy} AS DECIMAL(38,0)) * {cy}) AS DOUBLE)"
    sxy = f"CAST(SUM(CAST({cx} AS DECIMAL(38,0)) * {cy}) AS DOUBLE)"
    vx = f"({n} * {sxx} - {sx} * {sx})"
    vy = f"({n} * {syy} - {sy} * {sy})"
    cov = f"({n} * {sxy} - {sx} * {sy})"
    slope = f"(CASE WHEN {vx} = 0 THEN NULL ELSE {cov} / {vx} END)"
    return {
        "slope": slope,
        "intercept": (
            f"(CASE WHEN {vx} = 0 THEN NULL ELSE "
            f"({sy} - {cov} / {vx} * {sx}) / {n} / {m} END)"
        ),
        "r2": (
            f"(CASE WHEN {vx} = 0 OR {vy} = 0 THEN NULL ELSE "
            f"{cov} * {cov} / ({vx} * {vy}) END)"
        ),
    }
