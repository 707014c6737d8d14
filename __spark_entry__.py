"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship query smoke check on sf0.001.
``queries``    — every declared operator/query from SURVEY.md §2
                 (see discogs_load_spark/queries/*).
``oracle_sql`` — DuckDB-runnable ANSI-SQL dual for each query (omitted only
                 for genuinely non-SQL-expressible ops → rows-only check).

Hashed-signature-index collision triage (for whoever reads a driver diff):
the DEFAULT index layout verifies near-dup pairs through 64-bit hash-set
images and 60-bit banding slots (queries/sig_index.py), so against the
exact-string DuckDB oracles a run carries a by-construction failure
probability of ~|union|²/2⁶⁵ per verified pair — < 10⁻¹⁰ total at the
driver's sf0.01 tier. A hash-mismatch on exactly ONE dedup-family query
should be re-run once; if it repeats, triage as a REAL bug (a repeatable
collision at these set sizes is beyond the bound), or re-run with
SPARK_GRAFT_SIG_HASHED=0 (the exact-string referee layout) to bisect.
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
