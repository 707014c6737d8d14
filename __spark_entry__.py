"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship query smoke check on sf0.001.
``queries``    — every declared operator/query from SURVEY.md §2
                 (see discogs_load_spark/queries/*).
``oracle_sql`` — DuckDB-runnable ANSI-SQL dual for each query (omitted only
                 for genuinely non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter where the driver launches from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from discogs_load_spark.queries import oracle_sql_map, queries_map  # noqa: E402
from discogs_load_spark.queries.core import q01_pricing_summary  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (same column names/types as the Spark side)."""
    return oracle_sql_map()
