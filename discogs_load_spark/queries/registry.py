"""Registry of declared queries.

Each query is a named pair of
  - a Spark callable ``fn(spark, sf_dir) -> DataFrame`` (DataFrame-API
    implementation — the engine), and
  - an optional ANSI-SQL oracle string that DuckDB can run over the same
    parquet tables (the independent referee).

The driver's correctness gate (and our local differential tests in
``tests/test_oracle_parity.py``) run both and compare row count, schema, and
an order-insensitive value hash. Queries with no SQL-expressible semantics
register ``oracle=None`` and get a rows-only check.

Determinism contract for every registered query (what makes value-hash
comparison possible):
  - floating-point AGGREGATES are computed exactly: per-row arithmetic stays
    in double (IEEE, bitwise deterministic), the per-row result is cast to a
    fixed-scale DECIMAL, summed exactly (order-insensitive), and cast back to
    DOUBLE — see ``discogs_load_spark.functions.numeric``;
  - every LIMIT / top-k is ordered with a unique tie-break key;
  - every collected array is sorted (``sort_array`` / ``list_sort``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as the Spark implementation of ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def queries_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
