from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = f"{TESTDATA}/sf0.001"
SF_MEDIUM = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from discogs_load_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    spark = get_spark(
        app_name="discogs_load_spark_tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    yield spark
    spark.stop()


@pytest.fixture()
def duck(tmp_path):
    """DuckDB connection with the same fixture views the driver registers.

    Function-scoped + memory-capped: a suite-long shared connection
    accumulates buffer-pool state across ~125 oracle queries and
    eventually throws hard bad_alloc on an arbitrary small allocation
    (observed repeatedly, different victim test each run). A fresh
    connection per test releases everything; the explicit cap + spill
    dir bound any single oracle. The spill dir lives under pytest's
    tmp_path so stale spill files are garbage-collected with the test
    tree instead of accumulating in /tmp."""
    import duckdb

    spill = tmp_path / "duck_spill"
    spill.mkdir()
    con = duckdb.connect()
    # bounded memory AND threads: DuckDB defaults to one thread per core,
    # and per-operator buffers scale with thread count — 32 threads beside
    # the 32-core Spark JVM is exactly the allocation spike that produced
    # cross-test bad_allocs (a big oracle left the process allocator so
    # fragmented that the NEXT test's 4 KB connect failed). Oracles here
    # run over sf0.001/sf0.01 fixtures; 4 threads + 8GB + a spill dir is
    # generous.
    con.execute("SET threads=4")
    con.execute("SET memory_limit='8GB'")
    con.execute(f"SET temp_directory='{spill}'")
    yield con
    con.close()
    import gc

    gc.collect()  # drop any lingering result buffers before the next test


def register_duck_views(con, sf_dir: str) -> None:
    for name in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
