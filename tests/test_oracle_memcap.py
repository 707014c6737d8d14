"""Every oracle the driver's gate will actually run (the PRIORITY top-50)
must survive a memory-squeezed DuckDB — the r03 gate lost 15 queries to a
contiguous OOM window (CORRECTNESS_r03: every red was
``OutOfMemoryException``, zero value mismatches), and the trigger was
reproducible locally: the q129 recall oracle composed ~150 KB of unrolled
vector SQL whose planning alone exhausted a 256 MB cap under the gate-like
worst case (no temp spill + one thread per core), then poisoned the NEXT
fresh connection's 32 KB allocation — the exact q129→q143 cascade.

This test pins the fix: EVERY registered oracle runs on its own connection
at a 256 MB ``memory_limit`` with NO ``temp_directory`` and default
threads, at the gate's scale factor (sf0.01) — the whole registry, not
just the current top-50, so a future rotation can never promote a latent
poison pill into the gate window.
"""

from __future__ import annotations

import pytest

from discogs_load_spark.queries import REGISTRY

from .conftest import SF_MEDIUM, register_duck_views

MEM_CAP = "256MB"

ALL_ORACLES = [
    name for name, spec in sorted(REGISTRY.items()) if spec.oracle is not None
]


@pytest.mark.parametrize("name", ALL_ORACLES)
def test_oracle_survives_memcap(name):
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(f"SET memory_limit='{MEM_CAP}'")
        # deliberately NO temp_directory and NO thread cap: the harsh
        # configuration that reproduced the gate's OOM cascade
        register_duck_views(con, SF_MEDIUM)
        rows = con.execute(REGISTRY[name].oracle).fetchall()
        assert rows is not None
    finally:
        con.close()
