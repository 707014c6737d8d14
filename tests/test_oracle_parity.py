"""Differential harness mirroring the driver's correctness gate.

For every registered query that declares an oracle: run the Spark
implementation and the DuckDB SQL on the same parquet fixtures and compare
row count, column names, and an order-insensitive value multiset —
normalizing only representation (not value): timestamps to UTC-naive
microseconds, NaN to a sentinel. Any value divergence here would also fail
the driver's hash comparison.
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from discogs_load_spark.queries import REGISTRY

from .conftest import SF_SMALL, register_duck_views


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _norm_rows(cols, rows):
    from collections import Counter

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_cell(r[i]) for i in idx) for r in rows)


ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    if spec.oracle_guard is not None:
        reason = spec.oracle_guard(spark, SF_SMALL)
        if reason:
            # the query itself must still run rows-only before the
            # comparison is skipped (a guarded query's own crash must
            # not hide behind the regime skip)
            assert spec.fn(spark, SF_SMALL).count() >= 0
            pytest.skip(f"oracle regime guard: {reason}")
    sdf = spec.fn(spark, SF_SMALL)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    register_duck_views(duck, SF_SMALL)
    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) != {len(drows)} (duckdb)"
    )
    s_norm = _norm_rows(scols, srows)
    d_norm = _norm_rows(dcols, drows)
    if s_norm != d_norm:
        only_s = list((s_norm - d_norm).items())[:3]
        only_d = list((d_norm - s_norm).items())[:3]
        raise AssertionError(
            f"{name}: value mismatch; spark-only rows: {only_s}; "
            f"duckdb-only rows: {only_d}"
        )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(name, spark):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMALL)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
