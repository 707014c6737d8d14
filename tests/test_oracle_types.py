"""Oracle output-type hygiene.

Round-1 lesson (VERDICT.md): every driver hash-mismatch was a TYPE
RENDERING artifact, not a value difference — DuckDB ``SUM(integer)``
returns HUGEINT, which renders ``764.0`` where Spark's BIGINT renders
``764``, silently breaking the value hash while the local multiset
comparison (which normalizes numerics) stays green.

This test closes the class: plan every registered oracle in DuckDB and
assert no result column is HUGEINT or DECIMAL. Planning-only — no data is
executed, so the whole registry checks in seconds.
"""

from __future__ import annotations

import pytest

from discogs_load_spark.queries import REGISTRY

from .conftest import SF_SMALL, register_duck_views

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)

_FORBIDDEN = ("HUGEINT", "DECIMAL")


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_output_types_render_like_spark(name, duck):
    register_duck_views(duck, SF_SMALL)
    rel = duck.sql(REGISTRY[name].oracle)
    bad = [
        (col, str(t))
        for col, t in zip(rel.columns, rel.types)
        if any(f in str(t).upper() for f in _FORBIDDEN)
    ]
    assert not bad, (
        f"{name}: oracle columns {bad} would render differently from "
        f"Spark's output (wrap integer SUMs in CAST(... AS BIGINT), "
        f"decimal aggregates in CAST(... AS DOUBLE))"
    )
